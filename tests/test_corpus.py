"""Corpus-assembly operators (ducktales_spark.corpus): benchmark
decontamination, weighted domain mixing, deterministic shard writing.

Differential tests mirror the driver's oracle protocol: the same
md5-derived arithmetic expressed in DuckDB SQL over the same parquet,
compared with tests.oracle.compare.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ducktales_spark.corpus import (
    decontaminate,
    mix_corpus,
    write_training_shards,
)
from tests.oracle import duckdb_conn, compare


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- decontaminate ---------------------------------------------------------


def test_decontaminate_planted(spark):
    """A doc sharing a 13-gram with the benchmark is flagged; short docs and
    non-overlapping docs are clean."""
    words = " ".join(f"w{i}" for i in range(13))
    corpus = spark.createDataFrame(
        [
            (1, f"intro {words} outro"),  # contains the benchmark 13-gram
            (2, "too short to have any thirteen gram at all"),  # < 13 words
            (3, " ".join(f"z{i}" for i in range(30))),  # no overlap
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"prefix {words} suffix")], "doc_id long, text string"
    )
    out = decontaminate(corpus, bench)
    flags = {
        r["doc_id"]: (r["contaminated"], r["n_hits"])
        for r in out["flags"].collect()
    }
    assert flags[1][0] and flags[1][1] >= 1
    assert flags[2] == (False, 0)
    assert flags[3] == (False, 0)
    assert sorted(r["doc_id"] for r in out["clean"].collect()) == [2, 3]


def test_decontaminate_min_hits_threshold(spark):
    """min_hits raises the bar: one shared 13-gram is not enough at
    min_hits=2, two distinct shared 13-grams are."""
    g = [f"w{i}" for i in range(14)]  # 14 words -> two distinct 13-grams
    corpus = spark.createDataFrame(
        [(1, " ".join(g)), (2, " ".join(g[:13]) + " unique tail here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, " ".join(g))], "doc_id long, text string")
    out = decontaminate(corpus, bench, min_hits=2)
    flags = {
        r["doc_id"]: (r["contaminated"], r["n_hits"])
        for r in out["flags"].collect()
    }
    assert flags[1] == (True, 2)  # shares both 13-grams
    # below-threshold doc still audits its RAW hit count, not 0
    assert flags[2] == (False, 1)
    # the returned hits table itself is thresholded
    assert {r["doc_id"] for r in out["hits"].collect()} == {1}


def test_decontaminate_matches_duckdb(spark, sf_dir, docs):
    """Full cross-engine differential on the driver corpus: benchmark =
    every 7th document, hit counts must match DuckDB's identical-hash SQL."""
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    hits = decontaminate(docs, bench)["hits"].withColumn(
        "n_hits", F.col("n_hits").cast("long")
    )
    gram = " || ' ' || ".join(f"ws[i+{j}]" for j in range(13))
    con = duckdb_conn(sf_dir)
    problems = compare(
        hits,
        con,
        rf"""
        WITH d AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
          FROM documents
        ),
        pos AS (
          SELECT doc_id, ws, unnest(range(1, len(ws) - 11)) AS i
          FROM d WHERE len(ws) >= 13
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 ('0x' || substr(md5({gram}), 1, 15))::BIGINT AS h
          FROM pos
        ),
        b AS (SELECT DISTINCT h FROM sh WHERE doc_id % 7 = 0)
        SELECT sh.doc_id, count(*) AS n_hits
        FROM sh JOIN b USING (h)
        GROUP BY sh.doc_id
        """,
    )
    assert problems == [], problems
    # sanity: benchmark docs long enough self-contaminate
    assert hits.count() > 0


def test_decontaminate_fuzzy_catches_paraphrase(spark):
    """Near-verbatim leakage (a token substituted every 10 words) breaks
    EVERY overlapping 13-gram, so exact mode misses it entirely — fuzzy
    (MinHash 3-shingle jaccard) catches it; an unrelated doc stays clean
    in both modes. All hashing is deterministic, so the estimated jaccard
    is a fixed value, not a random variable."""
    base = [f"w{i}" for i in range(200)]
    para = [(f"SUB{i}" if i % 10 == 0 else w) for i, w in enumerate(base)]
    corpus = spark.createDataFrame(
        [
            (1, " ".join(para)),  # paraphrased benchmark doc
            (2, " ".join(f"z{i}" for i in range(200))),  # unrelated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join(base))], "doc_id long, text string"
    )
    exact = decontaminate(corpus, bench, mode="exact")
    assert {r.doc_id for r in exact["hits"].collect()} == set()
    fuzzy = decontaminate(corpus, bench, mode="fuzzy", threshold=0.4)
    hits = {r.doc_id: r for r in fuzzy["hits"].collect()}
    assert set(hits) == {1}
    assert hits[1].n_hits == 1 and hits[1].max_jaccard >= 0.4
    assert sorted(r.doc_id for r in fuzzy["clean"].collect()) == [2]
    # audit face keeps the exact-mode shape
    flags = {r.doc_id: r.contaminated for r in fuzzy["flags"].collect()}
    assert flags == {1: True, 2: False}


def test_decontaminate_fuzzy_matches_duckdb(spark, sf_dir, docs):
    """Cross-engine differential of the ENTIRE fuzzy path on the driver
    corpus (benchmark = every 7th doc): DuckDB replays the identical
    deterministic minhash family, band join, jaccard threshold, and
    per-doc aggregation — (doc_id, n_hits, max_jaccard) must hash-match.
    k/32 jaccards are exact binary fractions, so no rounding is needed."""
    from ducktales_spark.queries.dedup import (
        _BAND_ROWS,
        _HASH_AB,
        _NUM_HASHES,
        _P,
    )

    bench = docs.filter(F.col("doc_id") % 7 == 0)
    hits = decontaminate(docs, bench, mode="fuzzy", threshold=0.8)[
        "hits"
    ].withColumn("n_hits", F.col("n_hits").cast("long"))
    n_bands = _NUM_HASHES // _BAND_ROWS
    mins = ",\n        ".join(
        f"min(({a} * (h64 % {_P}) + {b}) % {_P}) AS m{i}"
        for i, (a, b) in enumerate(_HASH_AB)
    )
    band_rows = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {i} AS band_id, "
        + " || '-' || ".join(
            f"m{i * _BAND_ROWS + j}::VARCHAR" for j in range(_BAND_ROWS)
        )
        + " AS band_key FROM sig"
        for i in range(n_bands)
    )
    est = (
        "("
        + " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(_NUM_HASHES))
        + f") / {float(_NUM_HASHES)}"
    )
    con = duckdb_conn(sf_dir)
    problems = compare(
        hits,
        con,
        rf"""
        WITH d AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
          FROM documents
        ),
        pos AS (
          SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
          FROM d WHERE len(ws) >= 3
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 ('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' ||
                                     ws[i+2]), 1, 15))::BIGINT AS h64
          FROM pos
        ),
        sig AS MATERIALIZED (
          SELECT doc_id, {mins}
          FROM sh GROUP BY doc_id
        ),
        bands AS MATERIALIZED ({band_rows}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS bench_id
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
          WHERE b.doc_id % 7 = 0
        ),
        scored AS (
          SELECT cand.doc_id, cand.bench_id, {est} AS est
          FROM cand
          JOIN sig sa ON sa.doc_id = cand.doc_id
          JOIN sig sb ON sb.doc_id = cand.bench_id
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
               max(est) AS max_jaccard
        FROM scored WHERE est >= 0.8
        GROUP BY doc_id
        """,
    )
    assert problems == [], problems
    # sanity: benchmark docs in the corpus self-match at jaccard 1.0
    assert hits.filter("max_jaccard = 1.0").count() > 0


def test_bench_broadcast_guard(spark, tmp_path, docs):
    """The benchmark join is broadcast-hinted while plan stats fit under
    the cap and UN-hinted above it, with identical survivors. Hint
    presence is asserted on the analyzed plan (above the cap Catalyst may
    still CHOOSE a broadcast for a small table — the guard's contract is
    only that we stop forcing one)."""
    corpus = docs.limit(60)
    bench_path = str(tmp_path / "bench.parquet")
    docs.filter(F.col("doc_id") % 7 == 0).limit(
        20
    ).write.parquet(bench_path)
    bench = spark.read.parquet(bench_path)  # parquet scan -> REAL stats

    def hinted(df):
        return "strategy=broadcast" in df._jdf.queryExecution().analyzed().toString()

    small = decontaminate(corpus, bench)
    big = decontaminate(corpus, bench, max_broadcast_bytes=1)
    assert hinted(small["hits"]) and not hinted(big["hits"])
    assert sorted(r.doc_id for r in small["clean"].collect()) == sorted(
        r.doc_id for r in big["clean"].collect()
    )
    # fuzzy mode takes the same guard
    fsmall = decontaminate(corpus, bench, mode="fuzzy", threshold=0.8)
    fbig = decontaminate(
        corpus, bench, mode="fuzzy", threshold=0.8, max_broadcast_bytes=1
    )
    assert hinted(fsmall["hits"]) and not hinted(fbig["hits"])
    assert sorted(r.doc_id for r in fsmall["hits"].collect()) == sorted(
        r.doc_id for r in fbig["hits"].collect()
    )


# --- mix_corpus ------------------------------------------------------------

_WEIGHTS = {"src0": 2.0, "src1": 0.5, "src2": 2.5, "src3": 0.0}


def test_mix_corpus_epoch_semantics(spark, docs):
    mixed = mix_corpus(docs, _WEIGHTS).select("doc_id", "source", "epoch")
    per_doc = {
        (r["doc_id"]): r["cnt"]
        for r in mixed.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    rows = mixed.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    # integer weight: exactly w copies of every doc, epochs 0..w-1
    assert all(per_doc[r["doc_id"]] == 2 for r in by_src["src0"])
    assert sorted({r["epoch"] for r in by_src["src0"]}) == [0, 1]
    # fractional-only weight: 0 or 1 copy, epoch 0, roughly half the docs
    n_src1_docs = docs.filter(F.col("source") == "src1").count()
    assert {r["epoch"] for r in by_src["src1"]} == {0}
    assert 0 < len(by_src["src1"]) < n_src1_docs
    # mixed weight: every doc 2 or 3 copies, epoch 2 is the sampled one
    src2_counts = [
        per_doc[d["doc_id"]]
        for d in docs.filter(F.col("source") == "src2").collect()
    ]
    assert set(src2_counts) <= {2, 3} and 3 in src2_counts
    # weight 0 and unlisted domains are excluded
    assert "src3" not in by_src and "src4" not in by_src


def test_mix_corpus_deterministic_and_seeded(spark, docs):
    a = sorted(
        (r["doc_id"], r["epoch"])
        for r in mix_corpus(docs, _WEIGHTS).select("doc_id", "epoch").collect()
    )
    b = sorted(
        (r["doc_id"], r["epoch"])
        for r in mix_corpus(docs, _WEIGHTS).select("doc_id", "epoch").collect()
    )
    assert a == b
    c = sorted(
        (r["doc_id"], r["epoch"])
        for r in mix_corpus(docs, _WEIGHTS, seed=7)
        .select("doc_id", "epoch")
        .collect()
    )
    assert a != c  # different seed reshuffles the fractional epochs


def test_mix_corpus_matches_duckdb(spark, sf_dir, docs):
    mixed = mix_corpus(docs, _WEIGHTS).select("doc_id", "epoch")
    values = ", ".join(
        f"('{d}', {w})" for d, w in _WEIGHTS.items() if w > 0
    )
    con = duckdb_conn(sf_dir)
    problems = compare(
        mixed,
        con,
        f"""
        WITH w(source, wt) AS (VALUES {values}),
        e AS (
          SELECT d.doc_id, w.wt, ep.epoch
          FROM documents d
          JOIN w USING (source)
          CROSS JOIN (SELECT unnest(range(0, 3)) AS epoch) ep
        )
        SELECT doc_id, CAST(epoch AS INT) AS epoch
        FROM e
        WHERE epoch < floor(wt)
           OR (epoch < wt AND
               (('0x' || substr(md5(doc_id::VARCHAR || ':' || epoch::VARCHAR
                                     || ':' || '42'), 1, 15))::BIGINT
                % 1000000000) / 1e9 < wt - floor(wt))
        """,
    )
    assert problems == [], problems


def test_mix_corpus_rejects_negative_weight(spark, docs):
    with pytest.raises(ValueError):
        mix_corpus(docs, {"src0": -1.0})


def test_mix_corpus_rejects_colliding_columns(spark, docs):
    for col in ("epoch", "__w", "__epoch"):
        with pytest.raises(ValueError, match="collide"):
            mix_corpus(docs.withColumn(col, F.lit(1)), _WEIGHTS)


def test_mix_corpus_preserves_column_order(spark, docs):
    assert mix_corpus(docs, _WEIGHTS).columns == docs.columns + ["epoch"]
    # empty-weights branch agrees on shape
    assert mix_corpus(docs, {}).columns == docs.columns + ["epoch"]


# --- pack_sequences --------------------------------------------------------


def _chunks_df(spark, docs):
    from ducktales_spark.queries.text_pipeline import chunk_documents

    return chunk_documents(docs, max_tokens=64, overlap=0)


def test_pack_sequences_strict(spark, docs):
    from ducktales_spark.corpus import pack_sequences

    chunks = _chunks_df(spark, docs)
    packed = pack_sequences(chunks, budget=256, n_shards=8)
    rows = packed.collect()
    # lossless: every chunk appears exactly once
    assert sorted((r["doc_id"], r["chunk_id"]) for r in rows) == sorted(
        (r["doc_id"], r["chunk_id"]) for r in chunks.collect()
    )
    # capacity: no multi-chunk sequence exceeds the budget; and next-fit is
    # tight — closing a sequence means the NEXT chunk would not have fit
    by_seq: dict = {}
    for r in rows:
        by_seq.setdefault((r["shard"], r["seq_id"]), []).append(r)
    for (shard, seq_id), members in by_seq.items():
        members.sort(key=lambda r: r["position"])
        total = sum(r["n_chunk_tokens"] for r in members)
        if len(members) > 1:
            assert total <= 256, (shard, seq_id, total)
        assert [r["position"] for r in members] == list(range(len(members)))
        nxt = by_seq.get((shard, seq_id + 1))
        if nxt:
            first_next = min(nxt, key=lambda r: r["position"])
            assert total + first_next["n_chunk_tokens"] > 256, (
                "sequence closed early", shard, seq_id,
            )


def test_pack_sequences_relaxed_bounded_overflow(spark, docs):
    from ducktales_spark.corpus import pack_sequences

    chunks = _chunks_df(spark, docs)
    packed = pack_sequences(chunks, budget=256, n_shards=8, strict=False)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # the all-JVM variant stays all-JVM
    max_chunk = 64
    totals = {}
    for r in packed.collect():
        k = (r["shard"], r["seq_id"])
        totals[k] = totals.get(k, 0) + r["n_chunk_tokens"]
    assert max(totals.values()) <= 256 + max_chunk - 1


def test_pack_sequences_deterministic_and_oversize(spark):
    from ducktales_spark.corpus import pack_sequences

    rows = [(1, 0, 10, "a " * 10), (1, 1, 300, "b " * 300), (2, 0, 20, "c")]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_id int, n_chunk_tokens int, chunk string"
    )
    a = sorted(map(tuple, pack_sequences(chunks, budget=256).collect()))
    b = sorted(map(tuple, pack_sequences(chunks, budget=256).collect()))
    assert a == b  # deterministic
    packed = pack_sequences(chunks, budget=256, n_shards=1).collect()
    # the 300-token chunk is alone in its over-budget sequence, never split
    big = [r for r in packed if r["n_chunk_tokens"] == 300]
    assert len(big) == 1
    seq_members = [r for r in packed if r["seq_id"] == big[0]["seq_id"]]
    assert seq_members == big

    import pytest as _pt

    with _pt.raises(ValueError):
        pack_sequences(chunks, budget=0)


def test_pack_sequences_derives_shard_count_from_stats(
    spark, docs, tmp_path
):
    """n_shards=None sizes shards from plan statistics: a corpus whose
    stats imply MORE than the old fixed 64 shards must get the derived
    count (one shard per ~target_shard_bytes), and packing stays lossless
    at that count — the executor-memory contract at 100 TB."""
    from ducktales_spark.corpus import pack_sequences, shards_for

    path = str(tmp_path / "chunks")
    _chunks_df(spark, docs).write.parquet(path)
    chunks = spark.read.parquet(path)  # parquet scan -> real byte stats
    target = 512  # bytes, tiny on purpose: stats must imply > 64 shards
    derived = shards_for(chunks, target_shard_bytes=target)
    assert derived > 64
    size = int(
        chunks._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    assert derived == -(-size // target)
    packed = pack_sequences(chunks, budget=256, target_shard_bytes=target)
    rows = packed.collect()
    assert sorted((r["doc_id"], r["chunk_id"]) for r in rows) == sorted(
        (r["doc_id"], r["chunk_id"]) for r in chunks.collect()
    )
    shards = {r["shard"] for r in rows}
    assert shards <= set(range(derived)) and len(shards) > 64


def test_pack_sequences_unknown_stats_fallback(spark):
    """Python-created DataFrames report unknown plan stats
    (defaultSizeInBytes); shards_for must fall back instead of deriving an
    absurd count from the Long.MaxValue sentinel."""
    from ducktales_spark.corpus import shards_for

    chunks = spark.createDataFrame(
        [(1, 0, 10, "a")],
        "doc_id long, chunk_id int, n_chunk_tokens int, chunk string",
    )
    assert shards_for(chunks, fallback=64) == 64


def test_pack_sequences_strict_preserves_input_types(spark):
    """Strict mode's applyInPandas schema is derived from the INPUT: string
    doc ids (or any non-bigint id type) must round-trip, not crash or
    narrow — parity with strict=False which always preserved types."""
    from ducktales_spark.corpus import pack_sequences

    rows = [("doc-a", 0, 10, "x"), ("doc-b", 0, 200, "y"),
            ("doc-b", 1, 200, "z")]
    chunks = spark.createDataFrame(
        rows, "doc_id string, chunk_id int, n_chunk_tokens int, chunk string"
    )
    for strict in (True, False):
        packed = pack_sequences(chunks, budget=256, n_shards=2, strict=strict)
        assert dict(packed.dtypes)["doc_id"] == "string"
        assert sorted(
            (r["doc_id"], r["chunk_id"]) for r in packed.collect()
        ) == sorted((r[0], r[1]) for r in rows)


# --- write_training_shards -------------------------------------------------


def test_write_training_shards(spark, docs, tmp_path):
    n = 8
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=n)
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == n
    # exactly one data file per shard (the task that owns the shard wrote it)
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    # lossless: re-read equals input (shard is a derived column)
    back = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )


def _shard_orders(path):
    """doc_id sequences per shard, in physical file order."""
    orders = {}
    for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
        f = glob.glob(os.path.join(d, "*.parquet"))[0]
        orders[os.path.basename(d)] = pq.read_table(f, columns=["doc_id"])[
            "doc_id"
        ].to_pylist()
    return orders


def test_write_training_shards_deterministic(spark, docs, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a, n_shards=4)
    write_training_shards(docs, b, n_shards=4)
    oa, ob = _shard_orders(a), _shard_orders(b)
    assert oa == ob  # placement AND row order reproduce exactly
    c = str(tmp_path / "c")
    write_training_shards(docs, c, n_shards=4, seed=9)
    assert _shard_orders(c) != oa  # seed reshuffles


def test_shards_for_scaled_unknown_stats(spark):
    """Catalyst's size-only estimator scales the unknown-stat sentinel by
    row-width ratios through projections, producing huge-but-below-
    Long.MaxValue sizes; shards_for must treat the whole family as unknown
    (and cap any derived count) instead of returning billions of shards."""
    from ducktales_spark.corpus import pack_sequences, shards_for

    pads = ", ".join(f"pad{i} string" for i in range(6))
    wide = spark.createDataFrame(
        [(1, 0, 10, "a") + ("x",) * 6],
        "doc_id long, chunk_id int, n_chunk_tokens int, chunk string, "
        + pads,
    )
    narrowed = wide.select("doc_id", "chunk_id", "n_chunk_tokens", "chunk")
    size = int(
        narrowed._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    assert size < 1 << 62  # the scaled sentinel the raw check would miss
    assert shards_for(narrowed, fallback=64) == 64
    # and the whole packing path works on it
    assert pack_sequences(narrowed, budget=64).count() == 1


def test_bench_broadcast_probe_for_statless_frames(spark, docs):
    """Python-created benchmark frames carry no plan stats, so the cap
    fails open (broadcast, small-by-contract) by DEFAULT — and
    probe_unknown=True closes the hole with a measured COUNT-based
    estimate: over a 1-byte cap the hint is dropped, with identical
    survivors either way."""
    corpus = docs.limit(60)
    bench = spark.createDataFrame(  # statless: Long.MaxValue sentinel
        [(r.doc_id, r.text) for r in
         docs.filter(F.col("doc_id") % 7 == 0).limit(20)
             .select("doc_id", "text").collect()],
        "doc_id bigint, text string",
    )
    from ducktales_spark.corpus import plan_bytes

    assert plan_bytes(bench) is None

    def hinted(df):
        return "strategy=broadcast" in (
            df._jdf.queryExecution().analyzed().toString()
        )

    open_ = decontaminate(corpus, bench, max_broadcast_bytes=1)
    probed = decontaminate(corpus, bench, max_broadcast_bytes=1,
                           probe_unknown=True)
    assert hinted(open_["hits"]) and not hinted(probed["hits"])
    assert sorted(r.doc_id for r in open_["clean"].collect()) == sorted(
        r.doc_id for r in probed["clean"].collect()
    )
    # a probed tiny benchmark under a generous cap keeps the broadcast
    small = decontaminate(corpus, bench, probe_unknown=True)
    assert hinted(small["hits"])


def test_decontaminate_both_catches_each_leak_class(spark):
    """mode="both": one planted doc per leak class. A single verbatim
    benchmark 13-gram inside an otherwise-novel doc is invisible to fuzzy
    (13 shared 3-shingles barely move the estimated jaccard) but fires
    exact; a paraphrase (token substituted every 10 words) breaks every
    exact 13-gram but fires fuzzy. Either alone misses one of them; both
    catches both, and the audit face says WHICH test fired."""
    base = [f"w{i}" for i in range(200)]
    gram = " ".join(base[50:63])  # one verbatim benchmark 13-gram
    novel = [f"n{i}" for i in range(200)]
    verbatim_leak = " ".join(novel[:100]) + f" {gram} " + " ".join(novel[100:])
    para = " ".join(
        (f"SUB{i}" if i % 10 == 0 else w) for i, w in enumerate(base)
    )
    corpus = spark.createDataFrame(
        [
            (1, verbatim_leak),                          # exact-only class
            (2, para),                                   # fuzzy-only class
            (3, " ".join(f"z{i}" for i in range(200))),  # clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join(base))], "doc_id long, text string"
    )
    out = decontaminate(corpus, bench, mode="both", threshold=0.4)
    flags = {
        r["doc_id"]: (r["contaminated"], r["n_hits"], r["n_hits_fuzzy"])
        for r in out["flags"].collect()
    }
    assert flags[1][0] and flags[1][1] >= 1 and flags[1][2] == 0
    assert flags[2][0] and flags[2][1] == 0 and flags[2][2] >= 1
    assert flags[3] == (False, 0, 0)
    assert sorted(r["doc_id"] for r in out["clean"].collect()) == [3]
    # each single mode misses its blind-spot doc
    exact_only = decontaminate(corpus, bench, mode="exact")
    fuzzy_only = decontaminate(corpus, bench, mode="fuzzy", threshold=0.4)
    assert sorted(
        r["doc_id"] for r in exact_only["clean"].collect()
    ) == [2, 3]
    assert sorted(
        r["doc_id"] for r in fuzzy_only["clean"].collect()
    ) == [1, 3]
    # hits carries the per-mode audit columns
    assert {"doc_id", "n_hits", "n_hits_fuzzy", "max_jaccard"} <= set(
        out["hits"].columns
    )


# --- split_corpus ----------------------------------------------------------


def test_split_corpus_stable_under_growth(spark, docs):
    """Hash mode's load-bearing property: a document's split NEVER changes
    when other documents are added — eval examples cannot migrate into
    train between incremental corpus builds."""
    from ducktales_spark.corpus import split_corpus

    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    small = {
        r.doc_id: r.split
        for r in split_corpus(docs.limit(100), fr).select(
            "doc_id", "split"
        ).collect()
    }
    full = {
        r.doc_id: r.split
        for r in split_corpus(docs, fr).select("doc_id", "split").collect()
    }
    assert small == {k: full[k] for k in small}
    # proportions are approximately honored and every split is non-empty
    from collections import Counter

    c = Counter(full.values())
    n = sum(c.values())
    assert 0.8 < c["train"] / n < 0.97 and c["val"] and c["test"]


def test_split_corpus_exact_stratified(spark, docs):
    """exact=True hits the requested proportions per stratum via
    percent_rank within each source."""
    from collections import Counter

    from ducktales_spark.corpus import split_corpus

    out = split_corpus(
        docs, {"train": 0.8, "test": 0.2}, strata=("source",), exact=True
    ).select("source", "split").collect()
    per = {}
    for r in out:
        per.setdefault(r.source, Counter())[r.split] += 1
    for src, c in per.items():
        n = sum(c.values())
        if n >= 20:
            assert abs(c["train"] / n - 0.8) < 0.05, (src, dict(c))


def test_split_corpus_validation(spark, docs):
    from ducktales_spark.corpus import split_corpus

    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(docs, {"train": 0.5, "test": 0.2})
    with pytest.raises(ValueError, match="non-negative"):
        split_corpus(docs, {"train": 1.5, "test": -0.5})
    with pytest.raises(ValueError, match="'split' column"):
        split_corpus(
            split_corpus(docs, {"a": 1.0}), {"b": 1.0}
        )


def test_split_corpus_partitions_the_corpus(spark, docs):
    """The splits PARTITION the input: every doc appears in exactly one
    split, nothing is dropped or duplicated, for both modes."""
    from ducktales_spark.corpus import split_corpus

    n = docs.count()
    for kwargs in ({}, {"strata": ("source",), "exact": True}):
        out = split_corpus(
            docs, {"train": 0.7, "val": 0.2, "test": 0.1}, **kwargs
        )
        assert out.count() == n
        assert out.select("doc_id").distinct().count() == n
        assert out.groupBy("split").count().count() <= 3
