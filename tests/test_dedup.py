"""Dedup-operator quality tests on planted near-duplicates: the sketch
queries (minhash LSH, simhash) are rows-only for the driver's oracle, so
their correctness gate lives here — recall/precision against a corpus with
known near-dup structure, plus agreement with the exact jaccard query."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ducktales_spark.queries.dedup import (
    minhash_candidate_pairs,
    shingle_table,
)

_WORDS = [f"w{i}" for i in range(500)]


@pytest.fixture(scope="module")
def planted(spark):
    """60 base docs + 20 near-dup pairs (one word in ~50 changed -> jaccard
    ~0.94 of shingles) + some unrelated docs. Deterministic seed."""
    rng = random.Random(7)
    rows = []
    did = 0
    truth = []
    for i in range(20):
        base = [rng.choice(_WORDS) for _ in range(50)]
        mutated = list(base)
        mutated[rng.randrange(50)] = rng.choice(_WORDS)
        rows.append((did, " ".join(base)))
        rows.append((did + 1, " ".join(mutated)))
        truth.append((did, did + 1))
        did += 2
    for _ in range(40):
        rows.append((did, " ".join(rng.choice(_WORDS) for _ in range(50))))
        did += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df, truth


def test_minhash_recall_and_precision(spark, planted):
    docs, truth = planted
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(docs).collect()
    }
    found = sum(1 for t in truth if t in pairs)
    assert found / len(truth) >= 0.9  # high-jaccard pairs must surface
    # precision: candidates should overwhelmingly be real near-dups
    assert len(pairs) <= len(truth) * 2


def test_minhash_estimate_tracks_true_jaccard(spark, planted):
    docs, truth = planted
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_candidate_pairs(docs).collect()
    }
    sh = shingle_table(docs)
    sets = {
        r["doc_id"]: set(r["ss"])
        for r in sh.groupBy("doc_id")
        .agg(F.collect_set("s").alias("ss"))
        .collect()
    }
    for (a, b), e in est.items():
        sa, sb = sets[a], sets[b]
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(e - true_j) < 0.25  # 32-hash estimator tolerance
    # and at least one planted pair's estimate is close to its true value
    a, b = truth[0]
    if (a, b) in est:
        true_j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        assert abs(est[(a, b)] - true_j) < 0.2


def test_unified_sketch_recall(spark, planted):
    """The one-join minhash+simhash operator (d03's engine): planted
    near-dup pairs must surface via minhash, and exact duplicates must
    surface via simhash with hamming 0 (a 1-word-in-50 mutation can flip
    several simhash bits, so only identical docs are guaranteed)."""
    from ducktales_spark.queries.dedup import unified_sketch_pairs

    docs, truth = planted
    # append exact duplicates of the first 5 base docs under new ids
    base5 = [(900 + i, r["text"]) for i, r in enumerate(
        docs.filter("doc_id < 5").orderBy("doc_id").collect())]
    docs2 = docs.union(docs.sparkSession.createDataFrame(
        base5, "doc_id bigint, text string"))
    rows = unified_sketch_pairs(docs2).collect()
    mh = {(r["doc_a"], r["doc_b"]) for r in rows if r["method"] == "minhash"}
    sh = {(r["doc_a"], r["doc_b"]): r["score"]
          for r in rows if r["method"] == "simhash"}
    found = sum(1 for t in truth if t in mh)
    assert found / len(truth) >= 0.9
    for i in range(5):  # exact dup -> simhash hamming 0
        assert sh.get((i, 900 + i)) == 0.0, (i, sh.get((i, 900 + i)))


def test_shingle_table_matches_naive(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, "  p  q r s  ")],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_id"], r["s"]) for r in shingle_table(docs).collect()
    }
    assert got == {
        (1, "a b c"), (1, "b c d"), (1, "c d e"),
        (3, "p q r"), (3, "q r s"),
    }  # doc 2 is shorter than n=3 -> no shingles
