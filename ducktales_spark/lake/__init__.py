"""Lakehouse layer: SQL-catalog-backed tables over parquet + Spark.

Public API:

>>> from ducktales_spark.lake import LakeCatalog, connect
>>> lake = connect("lake:/tmp/mylake", spark)
>>> with lake.transaction() as tx:
...     tx.create_table("inventory", schema, primary_key=["id"])
...     tx.insert_rows("inventory", [...])
>>> lake.read("inventory", version=3)          # time travel
>>> lake.snapshots(); lake.table_changes("inventory", 1, 3)
"""

from .catalog import (  # noqa: F401
    ConflictError,
    ConstraintViolation,
    LakeCatalog,
    LakeError,
    Transaction,
    connect,
)
from .rollup import create_rollup, refresh_rollup  # noqa: F401
from .schema import Field, TableSchema  # noqa: F401
