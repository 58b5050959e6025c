"""DuckDB-as-oracle differential harness mirroring the driver's compare:
row count + column names + order-insensitive value comparison (with float
tolerance, per FIXTURES.md)."""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb

from ducktales_spark.data import TABLES

_REL_TOL = 1e-6
_ABS_TOL = 1e-6


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT normalized to float: the driver's hash is exact,
        # so a Decimal-vs-float or scale mismatch between Spark and DuckDB
        # must fail here too (round-1 f06 lesson).
        return v
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__) if False else "", repr(v))
        for v in row
    )


def _rows(cols, data):
    """Column-name-sorted, normalized, row-sorted list of tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in data]
    return sorted(cols), sorted(rows, key=_sort_key)


def _values_close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        # exact-compare mode: both sides must be Decimal AND string-identical.
        # Decimal('123.4') == Decimal('123.40') is True, but the driver's
        # hash is over value REPRESENTATIONS — a scale mismatch must fail
        # here too (the round-1 f06 lesson this mode exists for).
        return type(a) is type(b) and str(a) == str(b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) and not (
        isinstance(a, bool) or isinstance(b, bool)
    ):
        return math.isclose(a, b, rel_tol=_REL_TOL, abs_tol=_ABS_TOL)
    return a == b


def compare(spark_df, con, sql) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems = []
    s_cols = [c.lower() for c in spark_df.columns]
    s_data = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    o_cols = [d[0].lower() for d in res.description]
    o_data = res.fetchall()

    sc, sr = _rows(s_cols, s_data)
    oc, orr = _rows(o_cols, o_data)
    if sc != oc:
        problems.append(f"column mismatch: spark={sc} oracle={oc}")
        return problems
    if len(sr) != len(orr):
        problems.append(f"row count: spark={len(sr)} oracle={len(orr)}")
        return problems
    # row-wise compare on sorted rows; float-tolerant. If sorting by repr
    # diverges due to float jitter, fall back to multiset-of-rounded compare.
    bad = 0
    for i, (a, b) in enumerate(zip(sr, orr)):
        if len(a) != len(b) or not all(_values_close(x, y) for x, y in zip(a, b)):
            bad += 1
            if bad <= 5:
                problems.append(f"row {i}: spark={a} oracle={b}")
    if bad and _multiset_match(sr, orr):
        return []  # same multiset, sort order of near-equal floats differed
    if bad > 5:
        problems.append(f"... {bad} mismatched rows total")
    return problems


def _round_row(row):
    return tuple(
        round(v, 6) if isinstance(v, float) and not math.isnan(v) else v
        for v in row
    )


def _multiset_match(sr, orr) -> bool:
    from collections import Counter

    return Counter(map(_round_row, sr)) == Counter(map(_round_row, orr))
