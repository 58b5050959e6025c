"""Streaming deduplicating ingestion: the training-data pipeline's front
door. Documents arrive on a stream; each micro-batch is deduplicated
within itself AND against everything already accepted, and only the
survivors land in the lake table — data, dedup state, and the exactly-once
epoch marker all commit in ONE lake snapshot.

Two filters, both reusing the batch engine's dedup kernels
(``ducktales_spark.queries.dedup``):

* exact       — md5(content) anti-join against the accepted-hash state
                table (``_dedup_hash__<table>``).
* near-dup    — deterministic 32-permutation MinHash + banded LSH: batch
                signatures band-join the accepted-signature state table
                (``_dedup_bands__<table>``); a batch doc is dropped when
                any band collides with an accepted doc and the estimated
                jaccard clears the threshold. Within-batch near-dups drop
                greedily (higher doc id loses).

100 TB posture:

* Per-batch cost is O(batch shingles) sketch work plus TWO keyed joins
  against state: the hash probe (uniform 128-bit keys) and the band probe
  (uniform short band keys). Neither ever materializes a pair space
  beyond actual band collisions.
* State is ~1-2% of corpus bytes (one 32-int signature + 8 band keys per
  accepted doc). On a real deployment both state tables are bucketed on
  their join key (content_hash / band_key) so probes co-locate instead of
  shuffling the full state per batch.
* Consistency: state reads happen INSIDE the commit transaction, so a
  batch sees exactly the accepted set of all committed batches; the
  conflict check serializes concurrent writers and a replayed batch is a
  no-op (same epoch protocol as ``start_lake_ingest``).
* Docs too short to shingle (< 3 words) have no signature; they pass the
  near-dup filter and are still exact-deduplicated.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ducktales_spark.lake import LakeCatalog
from ducktales_spark.queries.dedup import (
    est_jaccard,
    minhash_bands,
)
from ducktales_spark.streaming.ingest import _commit_batch, _epoch_table


def _state_tables(lake: LakeCatalog, table: str, near_dup: bool) -> tuple:
    """Ensure and return (hash_table, bands_table_or_None)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ht = f"_dedup_hash__{table}"
    if ht not in lake.tables():
        lake.create_table(
            ht,
            StructType(
                [
                    StructField("content_hash", StringType(), False),
                    StructField("doc_id", LongType(), False),
                ]
            ),
        )
    bt = None
    if near_dup:
        bt = f"_dedup_bands__{table}"
        if bt not in lake.tables():
            lake.create_table(
                bt,
                StructType(
                    [
                        StructField("doc_id", LongType(), False),
                        StructField("sig", ArrayType(IntegerType()), False),
                        StructField("band_id", IntegerType(), False),
                        StructField("band_key", StringType(), False),
                    ]
                ),
            )
    return ht, bt


def dedup_batch(
    batch_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: Optional[float],
    seen_hashes: Optional[DataFrame] = None,
    seen_bands: Optional[DataFrame] = None,
) -> tuple:
    """Deduplicate one bounded DataFrame within itself and (optionally)
    against prior state. Returns (survivors, hash_rows, band_rows) —
    hash/band rows cover ONLY the survivors, ready to append to state.

    Usable standalone for batch corpus ingestion; the streaming sink wraps
    it in the transactional commit.
    """
    hashed = batch_df.withColumn("content_hash", F.md5(F.col(text_col)))
    # within-batch exact: keep the lowest id per content hash
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col))
    batch = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__rn")
    )
    if seen_hashes is not None:
        batch = batch.join(
            seen_hashes.select("content_hash"), "content_hash", "left_anti"
        )

    band_rows = None
    if threshold is not None:
        docs = batch.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        bands = minhash_bands(docs)
        # within-batch near-dup: greedy drop of the higher id in any
        # band-colliding pair over the threshold
        a, b = bands.alias("a"), bands.alias("b")
        losers = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .filter(est_jaccard(F.col("a.sig"), F.col("b.sig")) >= threshold)
            .select(F.col("b.doc_id").alias("doc_id"))
        )
        if seen_bands is not None:
            losers = losers.unionByName(
                bands.alias("n")
                .join(
                    seen_bands.alias("s"),
                    (F.col("n.band_id") == F.col("s.band_id"))
                    & (F.col("n.band_key") == F.col("s.band_key")),
                )
                .filter(est_jaccard(F.col("n.sig"), F.col("s.sig")) >= threshold)
                .select(F.col("n.doc_id").alias("doc_id"))
            )
        losers = losers.distinct()
        # drop losers; sketch-less docs (< 3 words, no band rows) are never
        # losers and survive the near-dup filter by construction
        batch = batch.join(
            losers.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
        )
        band_rows = bands.join(losers, "doc_id", "left_anti").select(
            "doc_id", "sig", "band_id", "band_key"
        )

    hash_rows = batch.select(
        "content_hash", F.col(id_col).cast("long").alias("doc_id")
    )
    survivors = batch.drop("content_hash")
    return survivors, hash_rows, band_rows


def start_lake_dedup_ingest(
    stream_df: DataFrame,
    lake: LakeCatalog,
    table: str,
    *,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    minhash_threshold: Optional[float] = 0.7,
    benchmark_df: Optional[DataFrame] = None,
    benchmark_mode: str = "exact",
    benchmark_threshold: float = 0.8,
    trigger_seconds: Optional[float] = None,
    available_now: bool = False,
    query_name: str = "lake_dedup_ingest",
):
    """Start a deduplicating streaming ingest into ``lake.table``.

    ``minhash_threshold=None`` ingests with exact dedup only. Each
    micro-batch commits survivors + their dedup state + the epoch marker as
    ONE snapshot; replayed batches are no-ops (see module docstring for the
    protocol and the scale analysis).

    ``benchmark_df`` (a BOUNDED eval-set DataFrame) additionally
    decontaminates every micro-batch before dedup: contaminated documents
    never reach the table — the GPT-3 protocol applied at the ingest
    boundary, where it belongs (a contaminated doc filtered at ingest can
    never leak into a shard). ``benchmark_mode`` mirrors
    ``corpus.decontaminate``: "exact" (word-13-gram overlap), "fuzzy"
    (MinHash-LSH, estimated jaccard >= ``benchmark_threshold``), or
    "both" — exact AND fuzzy per batch, each catching the leak class the
    other misses (verbatim below the LSH shingle resolution / paraphrase
    that breaks every exact 13-gram); in that mode the RAW batch is
    persisted so the two passes share one batch scan. The benchmark's
    derived state (distinct n-gram hashes / LSH band table / both) is
    computed ONCE at start and reused by every batch; it is broadcast per
    batch while its plan-stat size fits (eval suites are definitionally
    small) and joins un-hinted above corpus._BENCH_BROADCAST_CAP.
    """
    from ducktales_spark import corpus as _corpus

    if benchmark_mode not in ("exact", "fuzzy", "both"):
        raise ValueError(f"unknown benchmark_mode: {benchmark_mode!r}")
    epoch_table = _epoch_table(lake, table)
    hash_table, bands_table = _state_tables(
        lake, table, minhash_threshold is not None
    )
    # one shot each, driver-small by contract; persisted so each micro-batch
    # joins the same computed set instead of re-shingling the benchmark
    bench_grams = bench_bands = None
    if benchmark_df is not None:
        if benchmark_mode in ("exact", "both"):
            bench_grams = _corpus.benchmark_ngrams(
                benchmark_df, id_col=id_col, text_col=text_col
            ).persist()
            bench_grams.count()
        if benchmark_mode in ("fuzzy", "both"):
            bench_bands = _corpus.benchmark_bands(
                benchmark_df, id_col=id_col, text_col=text_col
            ).persist()
            bench_bands.count()

    def _fuzzy_hit_ids(batch_df: DataFrame) -> DataFrame:
        return _corpus._fuzzy_counts(
            batch_df, None, id_col, text_col, benchmark_threshold,
            _corpus._BENCH_BROADCAST_CAP, bench_bands=bench_bands,
        ).select("doc_id")

    def _exact_hit_ids(batch_df: DataFrame) -> DataFrame:
        # corpus.decontaminate's plan, minus the audit face: the
        # precomputed benchmark set replaces its per-call re-shingle.
        # Hash = variadic xxhash64 over the 13 word columns, matching
        # corpus.benchmark_ngrams (both sides must hash identically).
        from ducktales_spark.queries.dedup import shingle_hash_table

        corpus = shingle_hash_table(
            batch_df, id_col=id_col, text_col=text_col, n=13
        )
        return (
            corpus.join(
                _corpus._bench_side(
                    bench_grams, _corpus._BENCH_BROADCAST_CAP
                ),
                "h",
            )
            .select("doc_id")
            .distinct()
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        raw = None
        if bench_grams is not None and bench_bands is not None:  # "both"
            raw = batch_df.persist()  # the two hit passes share one scan
            batch_df = raw
            hit_ids = _exact_hit_ids(raw).union(_fuzzy_hit_ids(raw))
        elif bench_bands is not None:
            hit_ids = _fuzzy_hit_ids(batch_df)
        elif bench_grams is not None:
            hit_ids = _exact_hit_ids(batch_df)
        else:
            hit_ids = None
        if hit_ids is not None:
            batch_df = batch_df.join(
                hit_ids,
                batch_df[id_col] == hit_ids["doc_id"],
                "left_anti",
            )
        batch_df = batch_df.persist()  # sketch + joins reuse it 3-4x
        try:

            def apply(tx):
                survivors, hash_rows, band_rows = dedup_batch(
                    batch_df,
                    id_col,
                    text_col,
                    minhash_threshold,
                    seen_hashes=tx.read(hash_table),
                    seen_bands=(
                        tx.read(bands_table) if bands_table else None
                    ),
                )
                if tx.insert(table, survivors):
                    tx.insert(hash_table, hash_rows)
                    if band_rows is not None:
                        tx.insert(bands_table, band_rows)

            _commit_batch(lake, epoch_table, batch_id, apply)
        finally:
            batch_df.unpersist()
            if raw is not None:
                raw.unpersist()

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
    query = writer.start()
    if bench_grams is not None:
        # release the cached benchmark set when this query terminates —
        # long-lived sessions starting many ingest streams would otherwise
        # leak one cached block set per stream
        _unpersist_on_terminate(lake.spark, query.id, bench_grams)
    if bench_bands is not None:
        _unpersist_on_terminate(lake.spark, query.id, bench_bands)
    return query


def _unpersist_on_terminate(spark, query_id, df) -> None:
    from pyspark.sql.streaming import StreamingQueryListener

    class _Release(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            if str(event.id) == str(query_id):
                try:
                    df.unpersist()
                finally:
                    spark.streams.removeListener(self)

    spark.streams.addListener(_Release())
