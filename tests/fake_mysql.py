"""SQLite-backed DBAPI-2.0 stand-in for PyMySQL — TEST infrastructure.

The sandbox has no MySQL server and no MySQL client library, so the
``mysql://`` catalog backend (``lake/metastore.py:MySQLMetastore``) was
previously dead code. This fake emulates exactly the DBAPI surface that
backend uses — ``connect(**kwargs)``, cursors, ``%s`` paramstyle,
``lastrowid``, ``commit``/``rollback``, ``GET_LOCK``/``RELEASE_LOCK``
advisory locks (connection-scoped and re-entrant, like MySQL's), and
``AUTO_INCREMENT`` DDL — so the backend's OWN code paths (URL parsing,
DDL adaptation, the advisory-lock transaction protocol, lastrowid
inserts, result draining) all execute for real; only the wire protocol
and the MySQL SQL dialect beyond what the metastore emits are absent.

Tests install it with ``monkeypatch.setitem(sys.modules, "pymysql", ...)``
and set ``BASE_DIR`` so each test gets its own catalog file.
"""

from __future__ import annotations

import os
import re
import sqlite3
import threading

# set by the test: directory holding one SQLite file per "database"
BASE_DIR: str | None = None

_LOCKS: dict = {}
_LOCKS_GUARD = threading.Lock()

_GET_LOCK = re.compile(r"SELECT\s+GET_LOCK\(%s,\s*(\d+)\)", re.I)
_RELEASE_LOCK = re.compile(r"SELECT\s+RELEASE_LOCK\(%s\)", re.I)


class Error(Exception):
    pass


class _Cursor:
    def __init__(self, conn: "_Connection"):
        self._c = conn
        self._cur = conn._sq.cursor()
        self._pending = None  # fake result rows for intercepted statements

    @property
    def lastrowid(self):
        return self._cur.lastrowid

    def execute(self, sql: str, params=()):
        s = sql.strip()
        m = _GET_LOCK.match(s)
        if m:
            ok = self._c._acquire(params[0], int(m.group(1)))
            self._pending = [(1 if ok else 0,)]
            return
        if _RELEASE_LOCK.match(s):
            self._pending = [(self._c._release(params[0]),)]
            return
        self._pending = None
        # the backend's only MySQL-isms in DDL/DML, mapped to SQLite
        s = s.replace(
            "BIGINT PRIMARY KEY AUTO_INCREMENT",
            "INTEGER PRIMARY KEY AUTOINCREMENT",
        ).replace("%s", "?")
        try:
            self._cur.execute(s, tuple(params))
        except sqlite3.Error as e:
            raise Error(str(e)) from e

    def fetchone(self):
        if self._pending is not None:
            rows, self._pending = self._pending, None
            return rows[0] if rows else None
        return self._cur.fetchone()

    def fetchall(self):
        if self._pending is not None:
            rows, self._pending = self._pending, None
            return rows
        return self._cur.fetchall()

    def close(self):
        self._cur.close()


class _Connection:
    def __init__(self, path: str, dbname: str):
        # isolation_level=None: the backend drives BEGIN/commit explicitly
        self._sq = sqlite3.connect(path, isolation_level=None, timeout=30.0)
        self._dbname = dbname
        self._held: dict = {}  # lock name -> re-entrancy depth

    def cursor(self) -> _Cursor:
        return _Cursor(self)

    def commit(self):
        self._sq.commit()

    def rollback(self):
        self._sq.rollback()

    def close(self):
        self._sq.close()

    # MySQL advisory-lock semantics: server-global by name, held by a
    # connection, re-entrant, timeout in seconds -> 1/0
    def _acquire(self, name: str, timeout: int) -> bool:
        key = (self._dbname, name)
        with _LOCKS_GUARD:
            lk = _LOCKS.setdefault(key, threading.Lock())
        if self._held.get(name):
            self._held[name] += 1
            return True
        if lk.acquire(timeout=timeout):
            self._held[name] = 1
            return True
        return False

    def _release(self, name: str) -> int:
        if not self._held.get(name):
            return 0
        self._held[name] -= 1
        if not self._held[name]:
            _LOCKS[(self._dbname, name)].release()
        return 1


def connect(
    host=None, database=None, port=None, user=None, password=None, **kw
) -> _Connection:
    if not BASE_DIR:
        raise Error("tests must set fake_mysql.BASE_DIR before connecting")
    path = os.path.join(BASE_DIR, f"{database or 'default'}.mysqlfake.db")
    return _Connection(path, database or "default")
