"""Streaming ingestion into the lake: micro-batch == snapshot.

The reference's continuous writer commits one DuckLake snapshot per small
append (``demos/03_schema_evolution/demo.py:39-70``). The Spark-native
equivalent is a Structured Streaming query whose ``foreachBatch`` sink runs
each micro-batch through ``LakeCatalog.transaction()`` — giving exactly-once
*appends* (Spark replays a failed batch; the conflict check plus the
``_ingest_epoch`` watermark table below make replayed batches idempotent) and
a queryable snapshot per batch, with tiny batches inlined into the catalog DB
instead of producing a small parquet file (M1).

Scale: the sink's Spark job is fully distributed; only the metadata commit is
a driver->catalog round trip, which is the design point (README.md:202-209).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from ducktales_spark.lake import ConflictError, LakeCatalog


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
    (tracked in the ``_ingest_epoch`` lake table, committed in the SAME
    transaction as the data) are skipped on replay -> exactly-once appends
    even though foreachBatch itself is at-least-once.
    """
    epoch_table = "_ingest_epoch"
    if epoch_table not in lake.tables():
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        lake.create_table(
            epoch_table,
            StructType(
                [
                    StructField("target", StringType(), False),
                    StructField("batch_id", LongType(), False),
                ]
            ),
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        for attempt in range(5):
            try:
                with lake.transaction() as tx:
                    seen = (
                        tx.read(epoch_table)
                        .filter(
                            f"target = '{table}' AND batch_id = {int(batch_id)}"
                        )
                        .count()
                    )
                    if seen:
                        return  # replayed batch — already committed
                    tx.insert(table, batch_df)
                    tx.insert_rows(
                        epoch_table,
                        [{"target": table, "batch_id": int(batch_id)}],
                    )
                return
            except ConflictError:
                continue
        raise ConflictError(f"batch {batch_id}: gave up after retries")

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
