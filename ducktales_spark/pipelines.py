"""End-to-end training-corpus preparation: the pipeline the individual
operators exist for, composed in the canonical order.

    quality gate -> PII redaction -> exact + near dedup -> chunking

Order matters and is deliberate:

* quality FIRST — it is the cheapest stage (one codegen projection) and
  typically drops the most bytes, so everything downstream (hashing,
  sketching, the dedup shuffles) runs on the smallest corpus.
* redaction BEFORE dedup — two documents differing only in their PII
  (mirrored spam with rotated phone numbers) become exact duplicates
  after tagging, which is what a dedup pass should treat them as.
* chunking LAST — chunk boundaries must never split or duplicate work the
  dedup already paid for, and chunk text must already be redacted.

Every stage is the library operator (quality_filter / redact_pii /
dedup_batch / minhash_candidate_pairs + dedup_components /
chunk_documents) — this module only composes, so the scale posture of each
stage is unchanged: projections for quality/redaction/chunking, the
banded-LSH shuffles for dedup, O(log^2 n) star rounds for clustering.

Near-dup resolution defaults to TRANSITIVE clustering (connected
components over the candidate-pair graph): exactly one survivor per
duplicate cluster, even on chains A~B~C where A and C are not directly
similar — the shape greedy pairwise dropping over-drops on (it would keep
only A, discarding C whose sole similar doc B is itself dropped).
``near_dup_strategy="greedy"`` keeps the cheaper per-pair drop for
throughput-first ingestion — it is what the streaming sink uses
per micro-batch, where state joins make chains rare. For a STREAMING
corpus the same composition runs per micro-batch via
``streaming.start_lake_dedup_ingest`` with the quality/redaction stages
applied to the stream before the sink.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ducktales_spark.graph import dedup_components
from ducktales_spark.queries.dedup import minhash_candidate_pairs
from ducktales_spark.queries.text_pipeline import (
    chunk_documents,
    quality_filter,
    redact_pii,
)
from ducktales_spark.streaming.dedup import dedup_batch


def prepare_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    minhash_threshold: Optional[float] = 0.7,
    max_tokens: int = 512,
    overlap: int = 64,
    near_dup_strategy: str = "components",
    max_dup_line_frac: Optional[float] = None,
    max_top_bigram_share: Optional[float] = None,
) -> dict:
    """Run the full preparation pipeline over a bounded corpus.

    Returns lazily-built DataFrames (nothing executes until the caller
    acts): ``quality`` (doc_id, keep, reasons — the audit table),
    ``documents`` (surviving docs, PII-redacted), ``chunks`` (doc_id,
    chunk_id, n_chunk_tokens, chunk), and — under the components strategy —
    ``clusters`` (doc_id, canonical_id, is_survivor: which cluster each
    exact-deduped doc landed in, the audit trail "why was this dropped").
    ``minhash_threshold=None`` skips near-dedup (exact only).
    ``near_dup_strategy``: "components" (default — one survivor per
    transitive cluster, min id wins) or "greedy" (drop the higher id of
    each colliding pair).

    ``max_dup_line_frac`` / ``max_top_bigram_share`` (opt-in, default off)
    add the repetition audit (repetition_signals) as a SECOND gate after
    the zero-shuffle quality rules: docs over either threshold are dropped
    and show up in the returned ``repetition`` audit table. It runs after
    quality on purpose — the bigram-mode leg costs a shuffle, so it should
    see only quality survivors."""
    if near_dup_strategy not in ("components", "greedy"):
        raise ValueError(f"unknown near_dup_strategy: {near_dup_strategy!r}")
    q = quality_filter(
        docs, id_col=id_col, text_col=text_col, min_words=min_words
    )
    kept = docs.join(
        q.filter("keep").select(F.col("doc_id").alias(id_col)),
        id_col,
        "left_semi",
    )
    rep = None
    if max_dup_line_frac is not None or max_top_bigram_share is not None:
        from ducktales_spark.queries.text_pipeline import repetition_signals

        rep = repetition_signals(kept, id_col=id_col, text_col=text_col)
        cond = F.lit(False)
        if max_dup_line_frac is not None:
            cond = cond | (F.col("dup_line_frac") > max_dup_line_frac)
        if max_top_bigram_share is not None:
            cond = cond | (F.col("top_bigram_share") > max_top_bigram_share)
        rep = rep.withColumn("dropped", cond)
        kept = kept.join(
            rep.filter("dropped").select(F.col("doc_id").alias(id_col)),
            id_col,
            "left_anti",
        )
    redacted = kept.withColumn(text_col, redact_pii(F.col(text_col)))
    clusters = None
    if minhash_threshold is not None and near_dup_strategy == "components":
        # exact dedup first (lowest id per content hash), then transitive
        # clustering of the LSH candidate pairs over the threshold
        exact, _, _ = dedup_batch(redacted, id_col, text_col, None)
        pairs = minhash_candidate_pairs(
            exact.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            )
        ).filter(F.col("est_jaccard") >= minhash_threshold)
        clusters = dedup_components(pairs, exact.select(id_col), id_col=id_col)
        survivors = exact.join(
            clusters.filter("is_survivor").select(id_col), id_col, "left_semi"
        )
    else:
        survivors, _, _ = dedup_batch(
            redacted, id_col, text_col, minhash_threshold
        )
    chunks = chunk_documents(
        survivors,
        id_col=id_col,
        text_col=text_col,
        max_tokens=max_tokens,
        overlap=overlap,
    )
    out = {"quality": q, "documents": survivors, "chunks": chunks}
    if rep is not None:
        out["repetition"] = rep
    if clusters is not None:
        out["clusters"] = clusters
    return out


def assemble_training_corpus(
    docs: DataFrame,
    bench: DataFrame,
    weights,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    budget: int = 512,
    max_tokens: int = 256,
    overlap: int = 32,
    n_shards: Optional[int] = None,
    seed: int = 42,
) -> dict:
    """The assembly stage end to end: a PREPARED corpus (already
    quality-gated/redacted/deduped — see prepare_training_corpus) becomes
    loader-ready shard files of packed training sequences:

        decontaminate(bench) -> mix_corpus(weights) -> chunk -> pack ->
        one parquet file per shard under ``path``

    Every stage is the library operator, so the composition inherits their
    scale shapes (broadcast benchmark, zero-shuffle mix, projection chunking,
    one packing shuffle) and their determinism: the same inputs produce
    byte-identical shard files. (doc, epoch) copies from the mixture get a
    composite ``mix_id`` so each epoch's chunks pack independently.

    Returns {"flags": per-doc contamination audit, "path": the shard dir};
    the written rows carry (shard, seq_id, position, mix_id, chunk_id,
    n_chunk_tokens, chunk, doc_id, epoch) — everything a loader or a
    lineage audit needs to trace a sequence back to its documents.
    """
    import math

    from ducktales_spark.corpus import (
        decontaminate,
        mix_corpus,
        pack_sequences,
    )

    decon = decontaminate(docs, bench, id_col=id_col, text_col=text_col)
    mixed = mix_corpus(
        decon["clean"], weights, domain_col=domain_col, id_col=id_col,
        seed=seed,
    )
    n_epochs = max(
        (int(math.ceil(w)) for w in weights.values() if w > 0), default=1
    )
    mixed = mixed.withColumn(
        "mix_id", F.col(id_col) * n_epochs + F.col("epoch")
    )
    chunks = chunk_documents(
        mixed,
        id_col="mix_id",
        text_col=text_col,
        max_tokens=max_tokens,
        overlap=overlap,
    ).withColumnRenamed("doc_id", "mix_id")
    packed = pack_sequences(
        chunks,
        budget=budget,
        id_col="mix_id",
        n_shards=n_shards,
        seed=seed,
    ).withColumns(
        {
            # floor-division decode consistent with pmod (DIV truncates
            # toward zero and mis-decodes negative doc_ids): subtracting the
            # non-negative pmod first makes the division exact for any sign
            id_col: F.expr(
                f"(mix_id - pmod(mix_id, {n_epochs})) DIV {n_epochs}"
            ),
            "epoch": F.pmod("mix_id", F.lit(n_epochs)).cast("int"),
        }
    )
    packed.write.mode("overwrite").partitionBy("shard").parquet(path)
    return {"flags": decon["flags"], "path": path}
