"""End-to-end corpus preparation over the driver's documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from ducktales_spark.pipelines import prepare_training_corpus


def test_prepare_training_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_in = docs.count()
    out = prepare_training_corpus(docs, min_words=10, minhash_threshold=0.5)

    q = out["quality"]
    assert q.count() == n_in  # audit covers every input doc
    n_kept = q.filter("keep").count()
    assert 0 < n_kept <= n_in

    survivors = out["documents"]
    n_surv = survivors.count()
    # dedup can only shrink the quality-kept set; the driver corpus plants
    # exact duplicates, so it must shrink strictly
    assert 0 < n_surv < n_kept
    assert survivors.columns == ["doc_id", "text"]

    chunks = out["chunks"]
    assert chunks.columns == ["doc_id", "chunk_id", "n_chunk_tokens", "chunk"]
    # every surviving doc produced at least one chunk, none exceeds budget
    assert chunks.select("doc_id").distinct().count() == n_surv
    assert chunks.filter(F.col("n_chunk_tokens") > 512).count() == 0


def test_redaction_before_dedup_merges_pii_variants(spark):
    """Docs identical up to their PII must collapse to one after the
    pipeline (redaction runs before dedup by design)."""
    base = ("Contact us for the offer and the terms that apply to the "
            "promotion which is valid in every region until the end of "
            "the month and includes the standard conditions we describe "
            "in the attached document for all new and existing customers "
            "who register before the deadline passes this coming season "
            "during regular business hours at ")
    rows = [
        (1, base + "555-123-4567 now"),
        (2, base + "555-987-6543 now"),
        (3, "The weather in the mountains is cold and the rivers are "
            "clear while people walk along the trails and birds fly over "
            "the valley where a small town sits beside an old stone "
            "bridge that has stood for many years through every storm."),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = prepare_training_corpus(docs, min_words=10, minhash_threshold=None)
    ids = sorted(r.doc_id for r in out["documents"].collect())
    assert ids == [1, 3], ids
