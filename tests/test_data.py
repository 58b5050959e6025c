"""data.table scan memoization: immutable sf-dir scans are cached per
(session, sf_dir, table) so repeated plan builds don't re-pay the py4j +
parquet-footer round trip, while distinct sessions and dirs stay isolated."""

from __future__ import annotations

from ducktales_spark.data import _SCAN_CACHE, table


def test_scan_memoized_per_session_and_dir(spark, sf_dir):
    a = table(spark, sf_dir, "documents")
    b = table(spark, sf_dir, "documents")
    assert a is b  # same session + dir + name -> the cached DataFrame
    assert table(spark, sf_dir, "orders") is not a  # per-table entries
    # a different sf_dir must never alias (same table name, other data)
    other = sf_dir.rstrip("/").rsplit("/", 1)[0] + "/sf0.01"
    assert table(spark, other, "documents") is not a
    # the cache is weak-keyed on the session: entries exist for this one
    assert spark in _SCAN_CACHE


def test_scan_memoization_preserves_events_ts_rebuild(spark, sf_dir):
    # events goes through the nanos-as-long legacy-conf read; the cached
    # copy must be the SAME rebuilt DataFrame, not a raw nanos scan
    e1 = table(spark, sf_dir, "events")
    e2 = table(spark, sf_dir, "events")
    assert e1 is e2
    assert e1.schema["ts"].dataType.typeName() in (
        "timestamp",
        "timestamp_ntz",
    )
