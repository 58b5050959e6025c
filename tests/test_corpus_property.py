"""Property-based invariants for the chunking -> packing path: for ANY
document set (random word counts, including empty and sub-budget docs) and
ANY (max_tokens, overlap, budget) combination, chunking must cover every
token with the declared overlap pattern and packing must be a lossless
capacity-respecting partition of the chunks.

Hypothesis drives the shapes (deadline disabled — each example is a Spark
job); examples kept small so the module stays fast."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ducktales_spark.corpus import pack_sequences
from ducktales_spark.queries.text_pipeline import chunk_documents


def _docs(spark, word_counts):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(n)))
        for i, n in enumerate(word_counts)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    word_counts=st.lists(st.integers(0, 300), min_size=1, max_size=8),
    max_tokens=st.integers(8, 64),
    overlap_frac=st.floats(0.0, 0.9),
)
def test_chunking_reconstructs_documents(
    spark, word_counts, max_tokens, overlap_frac
):
    """Dropping each chunk's overlapping prefix and concatenating in
    chunk_id order must reproduce the exact document text — i.e. chunking
    loses nothing, duplicates exactly `overlap` tokens per boundary, and
    chunk sizes respect the budget."""
    overlap = int(max_tokens * overlap_frac)
    step = max_tokens - overlap
    docs = _docs(spark, word_counts)
    chunks = chunk_documents(
        docs, max_tokens=max_tokens, overlap=overlap
    ).collect()
    by_doc: dict = {}
    for r in chunks:
        assert r["n_chunk_tokens"] <= max_tokens
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(word_counts)))  # every doc chunked
    for doc_id, n in enumerate(word_counts):
        members = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        rebuilt: list = []
        for k, r in enumerate(members):
            words = r["chunk"].split() if r["chunk"] else []
            rebuilt.extend(words if k == 0 else words[overlap:])
            if k:  # boundary duplicates exactly `overlap` tokens
                assert words[:overlap] == rebuilt[k * step : k * step + overlap]
        expected = [f"w{doc_id}x{j}" for j in range(n)]
        assert rebuilt == expected, (doc_id, n, len(rebuilt))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    token_counts=st.lists(st.integers(1, 120), min_size=1, max_size=30),
    budget=st.integers(16, 200),
    strict=st.booleans(),
)
def test_packing_lossless_and_capacity(spark, token_counts, budget, strict):
    """For any chunk-size multiset and budget: packing is a PARTITION
    (every chunk in exactly one (shard, seq, position)), positions are
    dense per sequence, and capacity holds — exactly for strict next-fit
    (multi-chunk sequences <= budget), within max_chunk-1 overflow for the
    all-JVM variant."""
    rows = [
        (i, 0, n, " ".join(["t"] * n)) for i, n in enumerate(token_counts)
    ]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_id int, n_chunk_tokens int, chunk string"
    )
    packed = pack_sequences(
        chunks, budget=budget, n_shards=4, strict=strict
    ).collect()
    assert sorted(r["doc_id"] for r in packed) == list(range(len(token_counts)))
    by_seq: dict = {}
    for r in packed:
        by_seq.setdefault((r["shard"], r["seq_id"]), []).append(r)
    max_chunk = max(token_counts)
    for members in by_seq.values():
        members.sort(key=lambda r: r["position"])
        assert [r["position"] for r in members] == list(range(len(members)))
        total = sum(r["n_chunk_tokens"] for r in members)
        if strict:
            if len(members) > 1:
                assert total <= budget
        else:
            assert total <= budget + max_chunk - 1


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    word_counts=st.lists(st.integers(0, 120), min_size=1, max_size=6),
    max_tokens=st.integers(8, 48),
    budget=st.integers(48, 160),
)
def test_chunk_pack_under_bpe_piece_counter(
    spark, word_counts, max_tokens, budget
):
    """The alternate token counter end to end: chunking with
    tokenizer=bpe_pieces (joiner='') must still reconstruct each document
    exactly (single-spaced text is fully piece-representable), count
    n_chunk_tokens in PIECE units (words like 'w3x7' are >1 piece), and
    packing under that counter must stay a lossless capacity-respecting
    partition."""
    from ducktales_spark.queries.text_pipeline import bpe_pieces

    # 'w{i}x{j}' words: letters/digits alternate -> multiple pieces/word
    docs = _docs(spark, word_counts)
    chunks = chunk_documents(
        docs, max_tokens=max_tokens, overlap=0,
        tokenizer=bpe_pieces, joiner="",
    )
    rows = chunks.collect()
    by_doc: dict = {}
    for r in rows:
        assert r["n_chunk_tokens"] <= max_tokens
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in enumerate(word_counts):
        members = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        rebuilt = "".join(r["chunk"] for r in members)
        expected = " ".join(f"w{doc_id}x{j}" for j in range(n))
        assert rebuilt == expected, (doc_id, rebuilt[:50])
        if n:  # piece units: each word is letters+digits+letters+digits
            total_pieces = sum(r["n_chunk_tokens"] for r in members)
            assert total_pieces > n  # strictly more pieces than words
    packed = pack_sequences(chunks, budget=budget, n_shards=3).collect()
    assert sorted((r["doc_id"], r["chunk_id"]) for r in packed) == sorted(
        (r["doc_id"], r["chunk_id"]) for r in rows
    )
    by_seq: dict = {}
    for r in packed:
        by_seq.setdefault((r["shard"], r["seq_id"]), []).append(r)
    for members in by_seq.values():
        if len(members) > 1:
            assert sum(r["n_chunk_tokens"] for r in members) <= budget
