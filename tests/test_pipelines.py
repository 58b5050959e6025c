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


def test_chain_corpus_keeps_one_survivor_per_cluster(spark):
    """Transitive near-dup semantics end to end (the default strategy): a
    chain A~B, B~C, C~D where A and D share little directly must collapse
    to exactly ONE survivor (the min id), while greedy pairwise dropping
    would also be fine on the pair level but cannot express 'same cluster'
    for audit. An unrelated doc survives untouched."""
    # sliding 40-word windows (step 8) over a 100-word sequence: adjacent
    # windows overlap 80% (near-dups), windows two+ steps apart fall under
    # the threshold — a genuine chain 0~1~2~3 with no shortcut edges.
    # Letter-only synthetic words + periodic stopwords keep every doc past
    # the quality gate (alpha ratio, stopword presence).
    cons, vow = "bcdfglmnprstvz", "aeiou"

    def synth(i):
        return (cons[i % 14] + vow[i % 5] + cons[(i // 14) % 14]
                + vow[(i // 5) % 5] + cons[(i // 196) % 14]
                + vow[(i // 25) % 5])

    words = ["the" if i % 9 == 4 else ("and" if i % 9 == 0 else synth(i))
             for i in range(100)]
    rows = [(k, " ".join(words[8 * k: 8 * k + 40])) for k in range(4)] + [
        (99, "the weather on the coast is mild and the boats return to "
             "the harbor before sunset while gulls circle the pier and "
             "fishermen mend their nets beside the market stalls near "
             "the old lighthouse that guards the bay every season")
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # sanity: the chain really is a chain (adjacent pairs similar, nothing
    # links the ends directly)
    from ducktales_spark.queries.dedup import minhash_candidate_pairs

    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(docs)
        .filter("est_jaccard >= 0.5")
        .collect()
    }
    assert pairs == {(0, 1), (1, 2), (2, 3)}, pairs

    out = prepare_training_corpus(docs, min_words=10, minhash_threshold=0.5)
    ids = sorted(r.doc_id for r in out["documents"].collect())
    assert ids == [0, 99], ids
    # the clusters audit table explains every drop: one cluster {0,1,2,3}
    # canonicalized at 0, and 99 its own singleton
    audit = {
        r.doc_id: (r.canonical_id, r.is_survivor)
        for r in out["clusters"].collect()
    }
    assert audit == {
        0: (0, True), 1: (0, False), 2: (0, False), 3: (0, False),
        99: (99, True),
    }

    # greedy keeps the same set here but is an explicit opt-in
    out_g = prepare_training_corpus(
        docs, min_words=10, minhash_threshold=0.5, near_dup_strategy="greedy"
    )
    assert sorted(r.doc_id for r in out_g["documents"].collect()) == [0, 99]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="near_dup_strategy"):
        prepare_training_corpus(docs, near_dup_strategy="nope")


def test_assemble_training_corpus_end_to_end(spark, sf_dir, tmp_path):
    """The assembly composition: decontaminate -> mix -> chunk -> pack ->
    shard files. Contaminated docs never reach the shards, epochs are
    realized per the mixture, sequences respect the budget, and the whole
    thing is byte-reproducible."""
    import glob
    import os

    from ducktales_spark.pipelines import assemble_training_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    weights = {f"src{i}": w for i, w in enumerate([2.0, 0.5] + [1.0] * 18)}
    out1 = str(tmp_path / "shards1")
    res = assemble_training_corpus(
        docs, bench, weights, out1, budget=128, max_tokens=64, overlap=8,
        n_shards=4,
    )
    flagged = {r.doc_id for r in res["flags"].filter("contaminated").collect()}
    assert flagged  # benchmark docs long enough self-contaminate
    back = spark.read.parquet(out1)
    assert len(glob.glob(os.path.join(out1, "shard=*"))) == 4
    got_docs = {r.doc_id for r in back.select("doc_id").distinct().collect()}
    assert got_docs.isdisjoint(flagged)
    # epochs realized: src0 docs appear with epochs {0,1}
    src0 = docs.filter("source = 'src0'").select("doc_id").collect()
    src0_ids = {r.doc_id for r in src0} - flagged
    epochs = {
        r.epoch
        for r in back.filter(F.col("doc_id").isin(list(src0_ids))).select(
            "epoch"
        ).distinct().collect()
    }
    assert epochs == {0, 1}
    # capacity: multi-chunk sequences within budget
    seq_tot = (
        back.groupBy("shard", "seq_id")
        .agg(F.sum("n_chunk_tokens").alias("t"), F.count("*").alias("n"))
        .filter("n > 1")
        .agg(F.max("t"))
        .first()[0]
    )
    assert seq_tot is None or seq_tot <= 128
    # reproducible end to end
    out2 = str(tmp_path / "shards2")
    assemble_training_corpus(
        docs, bench, weights, out2, budget=128, max_tokens=64, overlap=8,
        n_shards=4,
    )
    a = sorted(map(tuple, spark.read.parquet(out1).collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).collect()))
    assert a == b


def test_assemble_lineage_decodes_negative_doc_ids(spark, tmp_path):
    """mix_id encode/decode round-trip with SIGNED doc ids: the decode must
    use floor-division semantics consistent with pmod (truncating DIV
    mis-attributes doc_id=-1, epoch=1 to doc_id=0), so written shards carry
    the true (doc_id, epoch) lineage for any id sign."""
    from ducktales_spark.pipelines import assemble_training_corpus

    text = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(-1, "a", text), (-2, "a", text + " tail"), (7, "a", text + " x")],
        "doc_id long, source string, text string",
    )
    bench = spark.createDataFrame([], "doc_id long, source string, text string")
    out = str(tmp_path / "shards_neg")
    assemble_training_corpus(
        docs, bench, {"a": 2.0}, out, budget=64, max_tokens=16, overlap=0,
        n_shards=2,
    )
    back = spark.read.parquet(out)
    got = {
        (r.doc_id, r.epoch)
        for r in back.select("doc_id", "epoch").distinct().collect()
    }
    assert got == {(d, e) for d in (-1, -2, 7) for e in (0, 1)}


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


def test_pipeline_repetition_gate(spark):
    """Opt-in repetition thresholds drop template spam and keyword
    stuffing AFTER the zero-shuffle quality stage, with the audit table
    saying which signal fired; defaults leave behavior unchanged."""
    from ducktales_spark.pipelines import prepare_training_corpus

    def synth(i):
        # letter-only distinct words + periodic stopwords (the quality
        # fixture recipe): passes every zero-shuffle rule
        return "".join(chr(ord("a") + int(c)) for c in str(1000 + i))

    def wordy(k, n=60):
        return " ".join(
            "the" if i % 9 == 4 else ("and" if i % 9 == 0 else synth(100 * k + i))
            for i in range(n)
        )

    natural = wordy(1) + "\nand " + wordy(5)
    # 10 unique 12-word lines + 8 copies of the first: dup_line_frac 0.44
    # while the distinct-WORD ratio stays ~0.56 (passes the baseline rule)
    uniq = [wordy(10 + k, 12) for k in range(10)]
    spam = "\n".join(uniq + [uniq[0]] * 8)
    # "buy now" every third word: top_bigram_share ~0.33 while distinct
    # ratio ~0.35 (passes) — ordered repetition the word rule cannot see
    stuffing = "the start and then " + " ".join(
        f"{synth(300 + i)} buy now" for i in range(50)
    )
    docs = spark.createDataFrame(
        [(1, natural), (2, spam), (3, stuffing)],
        "doc_id long, text string",
    )
    base = prepare_training_corpus(docs, min_words=10, minhash_threshold=None)
    assert sorted(
        r.doc_id for r in base["documents"].select("doc_id").collect()
    ) == [1, 2, 3]
    out = prepare_training_corpus(
        docs,
        min_words=10,
        minhash_threshold=None,
        max_dup_line_frac=0.4,
        max_top_bigram_share=0.2,
    )
    assert sorted(
        r.doc_id for r in out["documents"].select("doc_id").collect()
    ) == [1]
    rep = {r.doc_id: r for r in out["repetition"].collect()}
    assert rep[2].dropped and rep[2].dup_line_frac > 0.4
    assert rep[3].dropped and rep[3].top_bigram_share > 0.2
    assert not rep[1].dropped
