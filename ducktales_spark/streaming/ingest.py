"""Streaming ingestion into the lake: micro-batch == snapshot.

The reference's continuous writer commits one DuckLake snapshot per small
append (``demos/03_schema_evolution/demo.py:39-70``). The Spark-native
equivalent is a Structured Streaming query whose ``foreachBatch`` sink runs
each micro-batch through ``LakeCatalog.transaction()`` — giving exactly-once
*appends* (Spark replays a failed batch; the conflict check plus the
per-target ``_ingest_epoch__<table>`` watermark table below make replayed
batches idempotent) and a queryable snapshot per batch, with tiny batches
inlined into the catalog DB instead of producing a small parquet file (M1).

Scale: the sink's Spark job is fully distributed; only the metadata commit is
a driver->catalog round trip, which is the design point (README.md:202-209).
Each stream's epoch marker lives in its OWN table — concurrent streams into
different targets never write-conflict on shared metadata (the commit
conflict check intersects touched table names).
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame

from ducktales_spark.lake import ConflictError, LakeCatalog


def _epoch_table(lake: LakeCatalog, target: str) -> str:
    """Ensure and return the per-target epoch watermark table."""
    name = f"_ingest_epoch__{target}"
    if name not in lake.tables():
        from pyspark.sql.types import LongType, StructField, StructType

        lake.create_table(
            name,
            StructType([StructField("batch_id", LongType(), False)]),
        )
    return name


def _commit_batch(lake: LakeCatalog, epoch_table: str, batch_id: int, apply):
    """Run ``apply(tx)`` + the epoch marker in ONE snapshot, idempotently.

    A replayed batch (batch_id already marked) rolls the txn back — commit
    would otherwise append a spurious empty snapshot per replay. Conflict
    retries back off exponentially so N concurrent streams into one target
    don't thrash."""
    for attempt in range(5):
        try:
            with lake.transaction() as tx:
                seen = (
                    tx.read(epoch_table)
                    .filter(f"batch_id = {int(batch_id)}")
                    .count()
                )
                if seen:
                    tx.rollback()  # replay: no data AND no empty snapshot
                    return
                apply(tx)
                tx.insert_rows(epoch_table, [{"batch_id": int(batch_id)}])
            return
        except ConflictError:
            time.sleep(0.05 * (2**attempt))
            continue
    raise ConflictError(f"batch {batch_id}: gave up after retries")


def start_lake_ingest(
    stream_df: DataFrame,
    lake: LakeCatalog,
    table: str,
    *,
    checkpoint_dir: str,
    trigger_seconds: Optional[float] = None,
    available_now: bool = False,
    query_name: str = "lake_ingest",
):
    """Start a streaming query appending ``stream_df`` into ``lake.table``.

    Each micro-batch commits one lake snapshot. Batch ids already ingested
    (tracked in the per-target ``_ingest_epoch__<table>`` lake table,
    committed in the SAME transaction as the data) are skipped on replay ->
    exactly-once appends even though foreachBatch itself is at-least-once.
    """
    epoch_table = _epoch_table(lake, table)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _commit_batch(
            lake, epoch_table, batch_id, lambda tx: tx.insert(table, batch_df)
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_lake_cdc_merge(
    stream_df: DataFrame,
    lake: LakeCatalog,
    table: str,
    on: list,
    *,
    checkpoint_dir: str,
    order_by: Optional[list] = None,
    when_matched: str = "update",
    trigger_seconds: Optional[float] = None,
    available_now: bool = False,
    query_name: str = "lake_cdc_merge",
):
    """Streaming CDC apply: each micro-batch is MERGEd (upsert) into a lake
    table instead of appended — the standard change-stream -> lakehouse
    pattern (e.g. keyed device state, dimension updates).

    Same exactly-once protocol as :func:`start_lake_ingest` (the per-target
    ``_ingest_epoch__<table>`` marker row commits in the SAME snapshot as
    the merge, so a replayed batch is a no-op). Duplicates of a key WITHIN
    one batch would violate merge's unique-source-key rule, so the batch is
    pre-deduped keeping the last row per key by ``order_by`` (e.g. a
    sequence/commit-ts column — the CDC stream's event order); without one,
    an arbitrary-but-deterministic row wins (all non-key columns
    descending), and a key-only stream (every column a merge key)
    deduplicates directly.

    Scale: merge prunes candidate files by the batch's key bounds — a
    micro-batch of CDC events against a 100 TB key-clustered table rewrites
    only the files its keys overlap.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    epoch_table = _epoch_table(lake, table)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # one deterministic row per key (last by order_by, CDC event order)
        ordering = order_by or [c for c in batch_df.columns if c not in on]
        if not ordering:
            # key-only batch: an empty window ORDER BY is invalid — plain
            # key dedup is equivalent
            deduped = batch_df.dropDuplicates(on)
        else:
            w = Window.partitionBy(*on).orderBy(
                *[F.col(c).desc_nulls_last() for c in ordering]
            )
            deduped = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter("__rn = 1")
                .drop("__rn")
            )
        _commit_batch(
            lake,
            epoch_table,
            batch_id,
            lambda tx: tx.merge(table, deduped, on, when_matched=when_matched),
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_rollup_ingest(
    stream_df: DataFrame,
    lake: LakeCatalog,
    table: str,
    rollup: str,
    *,
    checkpoint_dir: str,
    trigger_seconds: Optional[float] = None,
    available_now: bool = False,
    query_name: str = "rollup_ingest",
):
    """Continuously maintained aggregate: each micro-batch appends into the
    rollup's SOURCE table (the exactly-once epoch protocol above) and then
    advances the rollup incrementally — ``refresh_rollup`` folds just that
    batch's ``table_changes`` diff into the touched buckets, so per-batch
    maintenance cost is O(batch), never O(source). This is the streaming
    face of the TimescaleDB/Materialize continuous-aggregate model, built
    from the repo's own primitives (CDC diff + MERGE + snapshot log).

    Crash-safety: the append and the refresh are separate snapshots, but
    the refresh is driven by the rollup meta's last-refreshed version, so
    a crash BETWEEN them loses nothing — the next batch's refresh folds
    both batches' diffs, and the rollup-equals-recompute invariant holds
    at every refresh point (tests/test_streaming.py)."""
    from ducktales_spark.lake.rollup import refresh_rollup

    epoch_table = _epoch_table(lake, table)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _commit_batch(
            lake, epoch_table, batch_id, lambda tx: tx.insert(table, batch_df)
        )
        refresh_rollup(lake, rollup)

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
