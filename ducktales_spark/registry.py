"""Query registry: every operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers a named (spark_impl, oracle_sql) pair here.

The driver contract (``__spark_entry__.py``) exposes this registry through
``queries()`` and ``oracle_sql()``; pytest runs the same pairs differentially
against DuckDB at small SF.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB ANSI SQL; None => rows-only check
    survey_ids: tuple = field(default_factory=tuple)  # SURVEY.md §2 operator ids
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Parity-tested but NOT driver-swept: the driver checks exactly 50 registry
# entries, so when a new operator family needs a CORRECTNESS slot, a query
# whose SURVEY ids are redundantly covered rotates down here — it keeps its
# full DuckDB differential in pytest (tests/test_oracle_parity.py) but stops
# occupying a driver slot.
EXTRA: dict[str, QuerySpec] = {}


def _register_into(store: dict, name, oracle, survey_ids):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY or name in EXTRA:
            raise ValueError(f"duplicate query name: {name}")
        store[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey_ids=survey_ids, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def register(name: str, oracle: Optional[str] = None, survey_ids: tuple = ()):
    """Decorator: register a query implementation for the driver sweep.

    The decorated callable takes ``(spark, sf_dir)`` and returns a DataFrame.
    Every computed column must be aliased identically in the Spark plan and in
    ``oracle`` (the driver's value-hash sorts columns by name).
    """
    return _register_into(REGISTRY, name, oracle, survey_ids)


def register_extra(name: str, oracle: Optional[str] = None, survey_ids: tuple = ()):
    """Decorator: register a pytest-parity-only query (see EXTRA)."""
    return _register_into(EXTRA, name, oracle, survey_ids)


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: they register) and return the
    registry."""
    # Imports deferred so `import ducktales_spark` stays cheap.
    # ORDER MATTERS: the driver's correctness sweep walks the registry in
    # insertion order under a fixed per-round budget, so cheap oracle-backed
    # relational queries register first and the heavyweight multi-snapshot
    # lake scenarios + rows-only multimodal queries register last.
    from ducktales_spark.queries import (  # noqa: F401
        projections,
        setops,
        windows,
        text,
        aggregations,
        functions,
        joins,
        flagship,
        dedup,
        pipeline_queries,
        similarity,
        lake_demo,
        vector_queries,
        multimodal,
    )

    return REGISTRY


def load_extra() -> dict[str, QuerySpec]:
    """Import all query modules and return the pytest-parity-only registry."""
    load_all()
    return EXTRA
