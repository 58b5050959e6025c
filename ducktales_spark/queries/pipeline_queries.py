"""LLM-pipeline operators surfaced through the driver's correctness gate:
benchmark decontamination, weighted corpus mixing, transitive near-dup
clustering (distributed connected components), and chunking + PII redaction.

These are the registry faces of the library operators in
``ducktales_spark.corpus``, ``ducktales_spark.graph`` and
``queries.text_pipeline`` — each query is a deterministic, SQL-expressible
composition so the driver's DuckDB oracle verifies the full operator, not a
simplification. (Round 3 shipped the operators with in-suite differentials
only; this module promotes them to driver CORRECTNESS rows.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducktales_spark.corpus import decontaminate, mix_corpus, pack_sequences
from ducktales_spark.data import table
from ducktales_spark.graph import dedup_components
from ducktales_spark.queries.text_pipeline import (
    PII_PATTERNS_RE2_SAFE,
    chunk_documents,
    redact_pii,
)
from ducktales_spark.registry import register, register_extra

# 13-gram text as DuckDB SQL: ws[i] .. ws[i+12] joined by single spaces
# (ws is the whitespace-split word array, i 1-based).
_GRAM_13 = " || ' ' || ".join(f"ws[i+{j}]" for j in range(13))


@register(
    "c01_decontaminate",
    survey_ids=(),  # extension: benchmark n-gram decontamination
    oracle=rf"""
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
             ('0x' || substr(md5({_GRAM_13}), 1, 15))::BIGINT AS h
      FROM pos
    ),
    b AS (SELECT DISTINCT h FROM sh WHERE doc_id % 7 = 0)
    SELECT sh.doc_id, count(*) AS n_hits
    FROM sh JOIN b USING (h)
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
)
def c01_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-protocol 13-gram benchmark decontamination (corpus.decontaminate):
    benchmark = every 7th document, output = per-doc distinct shared-13-gram
    counts. The benchmark n-gram set is broadcast; the corpus side rides ONE
    doc_id exchange (shingling + hit-count groupBy share it)."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    return decontaminate(docs, bench)["hits"].withColumn(
        "n_hits", F.col("n_hits").cast("long")
    )


_MIX_WEIGHTS = {"src0": 2.0, "src1": 0.5, "src2": 2.5, "src3": 0.0}
_MIX_VALUES = ", ".join(
    f"('{d}', {w})" for d, w in _MIX_WEIGHTS.items() if w > 0
)


@register(
    "c02_mix_corpus",
    survey_ids=(),  # extension: weighted corpus mixing (epoch sampling)
    oracle=f"""
    WITH w(source, wt) AS (VALUES {_MIX_VALUES}),
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
    ORDER BY doc_id, epoch
    """,
)
def c02_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted training-mixture realization (corpus.mix_corpus): epochs
    0..floor(w)-1 are full copies, the fractional epoch keeps a deterministic
    md5-hash sample. Broadcast weights join + epoch explode — zero shuffle."""
    docs = table(spark, sf_dir, "documents")
    return mix_corpus(docs, _MIX_WEIGHTS).select("doc_id", "epoch")


@register(
    "g01_dedup_components",
    survey_ids=(),  # extension: distributed connected components
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CASE WHEN lag(lang) OVER (ORDER BY doc_id) = lang
                       AND doc_id - lag(doc_id) OVER (ORDER BY doc_id) = 1
                  THEN 0 ELSE 1 END AS brk
      FROM documents
    ),
    i AS (SELECT doc_id, sum(brk) OVER (ORDER BY doc_id) AS island FROM f)
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY island) AS canonical_id,
           doc_id = min(doc_id) OVER (PARTITION BY island) AS is_survivor
    FROM i
    ORDER BY doc_id
    """,
)
def g01_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering (graph.dedup_components — alternating
    large-star/small-star connected components) over a deterministic
    CHAIN-heavy similarity graph: an edge joins consecutive doc_ids sharing a
    language, so components are maximal same-lang runs — exactly the shape
    greedy pairwise dedup over-drops on. The oracle recomputes the clusters
    as a gaps-and-islands window (a formulation only possible because the
    graph is chain-structured; the Spark side runs the general algorithm)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"))
    b = d.select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
    )
    pairs = (
        a.join(b, "doc_a")
        .filter(F.col("lang_a") == F.col("lang_b"))
        .select("doc_a", "doc_b")
    )
    return dedup_components(pairs, d.select("doc_id"))


_CHUNK_TOKENS = 64
_CHUNK_OVERLAP = 16
_CHUNK_STEP = _CHUNK_TOKENS - _CHUNK_OVERLAP

# regexp_replace chain in DuckDB, innermost-first == _PII_PATTERNS order.
_REDACT_SQL = "text"
for _tag, _pat in PII_PATTERNS_RE2_SAFE:
    _REDACT_SQL = (
        f"regexp_replace({_REDACT_SQL}, '{_pat}', '[{_tag.upper()}]', 'g')"
    )


@register(
    "t05_chunk_redact",
    survey_ids=(),  # extension: document chunking + PII redaction
    oracle=rf"""
    WITH r AS (
      SELECT doc_id, {_REDACT_SQL} AS text FROM documents
    ),
    t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM r
    ),
    n AS (
      SELECT doc_id, ws,
             greatest(1, CAST(ceil((len(ws) - {_CHUNK_OVERLAP})
                                   / {_CHUNK_STEP}.0) AS INT)) AS nc
      FROM t
    ),
    e AS (
      SELECT doc_id, ws, CAST(unnest(range(0, nc)) AS INT) AS chunk_id FROM n
    )
    SELECT doc_id, chunk_id,
           CAST(len(ws[chunk_id*{_CHUNK_STEP}+1 :
                       chunk_id*{_CHUNK_STEP}+{_CHUNK_TOKENS}]) AS INT)
               AS n_chunk_tokens,
           array_to_string(ws[chunk_id*{_CHUNK_STEP}+1 :
                              chunk_id*{_CHUNK_STEP}+{_CHUNK_TOKENS}], ' ')
               AS chunk
    FROM e
    ORDER BY doc_id, chunk_id
    """,
)
def t05_chunk_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction -> overlapping token-budget chunking (the
    redact-before-chunk order prepare_training_corpus uses), end to end:
    (doc_id, chunk_id, n_chunk_tokens, chunk). Both stages are pure codegen
    projections (regexp_replace chain; tokenize-once + explode + array
    slice) — zero shuffle, zero Python. Redacts with the RE2-safe pattern
    subset so the DuckDB oracle applies the byte-identical regexes."""
    docs = table(spark, sf_dir, "documents")
    redacted = docs.withColumn(
        "text", redact_pii(F.col("text"), patterns=PII_PATTERNS_RE2_SAFE)
    )
    return chunk_documents(
        redacted, max_tokens=_CHUNK_TOKENS, overlap=_CHUNK_OVERLAP
    )


_PACK_BUDGET = 128
_PACK_SHARDS = 8
_PACK_CHUNK = 64
_PACK_STEP = _PACK_CHUNK  # overlap 0 for the packing differential


@register_extra(
    "c03_pack_relaxed",
    survey_ids=(),  # extension: training-sequence packing (all-JVM variant)
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents
    ),
    n AS (
      SELECT doc_id, ws,
             greatest(1, CAST(ceil(len(ws) / {_PACK_STEP}.0) AS INT)) AS nc
      FROM t
    ),
    c AS (
      SELECT doc_id, CAST(unnest(range(0, nc)) AS INT) AS chunk_id,
             ws[chunk_id*{_PACK_STEP}+1 : chunk_id*{_PACK_STEP}+{_PACK_CHUNK}]
                 AS cw
      FROM n
    ),
    ch AS (
      SELECT doc_id, chunk_id,
             CAST(len(cw) AS INT) AS n_chunk_tokens,
             array_to_string(cw, ' ') AS chunk,
             ('0x' || substr(md5(doc_id::VARCHAR || '@' || chunk_id::VARCHAR
                                 || '#' || '42'), 1, 15))::BIGINT AS h
      FROM c
    ),
    sh AS (
      SELECT *, CAST(h % {_PACK_SHARDS} AS INT) AS shard FROM ch
    ),
    cum AS (
      SELECT *,
             COALESCE(sum(n_chunk_tokens) OVER (
               PARTITION BY shard ORDER BY h, doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM sh
    ),
    seq AS (
      SELECT *, CAST(floor(cum_before / {_PACK_BUDGET}) AS BIGINT) AS seq_id
      FROM cum
    )
    SELECT shard, seq_id,
           CAST(row_number() OVER (
             PARTITION BY shard, seq_id ORDER BY h, doc_id, chunk_id
           ) - 1 AS INT) AS position,
           doc_id, chunk_id, n_chunk_tokens, chunk
    FROM seq
    ORDER BY shard, seq_id, position
    """,
)
def c03_pack_relaxed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing, all-JVM cumsum variant (strict=False):
    chunk the documents (no overlap), deal chunks to md5 hash shards, and
    assign seq_id = floor(cumulative-tokens-before / budget) over the
    shard-ordered window. Fully SQL-expressible, so this differential
    covers the shard hashing, the window ordering, and the bin arithmetic
    that the strict next-fit variant shares (its only delta is the exact
    capacity loop, covered by tests/test_corpus.py)."""
    docs = table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, max_tokens=_PACK_CHUNK, overlap=0)
    return pack_sequences(
        chunks,
        budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS,
        strict=False,
    )


@register(
    # promoted to the driver sweep in round 6 (was EXTRA): strict
    # next-fit packing is a genuinely new capability and deserves a
    # driver CORRECTNESS row; f06_casts rotated down to make room.
    "c04_pack_strict",
    survey_ids=(),  # extension: training-sequence packing (exact next-fit)
    oracle=rf"""
    WITH RECURSIVE t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents
    ),
    n AS (
      SELECT doc_id, ws,
             greatest(1, CAST(ceil(len(ws) / {_PACK_STEP}.0) AS INT)) AS nc
      FROM t
    ),
    c AS (
      SELECT doc_id, CAST(unnest(range(0, nc)) AS INT) AS chunk_id,
             ws[chunk_id*{_PACK_STEP}+1 : chunk_id*{_PACK_STEP}+{_PACK_CHUNK}]
                 AS cw
      FROM n
    ),
    ch AS (
      SELECT doc_id, chunk_id,
             CAST(len(cw) AS INT) AS n_chunk_tokens,
             array_to_string(cw, ' ') AS chunk,
             ('0x' || substr(md5(doc_id::VARCHAR || '@' || chunk_id::VARCHAR
                                 || '#' || '42'), 1, 15))::BIGINT AS h
      FROM c
    ),
    sh AS (
      SELECT *, CAST(h % {_PACK_SHARDS} AS INT) AS shard,
             row_number() OVER (PARTITION BY CAST(h % {_PACK_SHARDS} AS INT)
                                ORDER BY h, doc_id, chunk_id) AS rn
      FROM ch
    ),
    packed AS (
      SELECT shard, rn, doc_id, chunk_id, n_chunk_tokens, chunk,
             CAST(0 AS BIGINT) AS seq_id, 0 AS pos,
             n_chunk_tokens AS used
      FROM sh WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.chunk_id, o.n_chunk_tokens, o.chunk,
             CASE WHEN p.used + o.n_chunk_tokens > {_PACK_BUDGET}
                  THEN p.seq_id + 1 ELSE p.seq_id END,
             CASE WHEN p.used + o.n_chunk_tokens > {_PACK_BUDGET}
                  THEN 0 ELSE p.pos + 1 END,
             CASE WHEN p.used + o.n_chunk_tokens > {_PACK_BUDGET}
                  THEN o.n_chunk_tokens ELSE p.used + o.n_chunk_tokens END
      FROM packed p JOIN sh o ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT shard, seq_id, CAST(pos AS INT) AS position,
           doc_id, chunk_id, n_chunk_tokens, chunk
    FROM packed
    ORDER BY shard, seq_id, position
    """,
)
def c04_pack_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing, EXACT next-fit (strict=True, the
    applyInPandas per-shard linear pass): cross-engine differential via a
    DuckDB recursive CTE that walks each shard in the identical
    (h, doc_id, chunk_id) order carrying (seq_id, position, used) state —
    the sequential capacity loop itself, not just the windowed
    approximation c03 covers. Completes packing's differential story:
    every packing variant now has an independent-engine oracle."""
    docs = table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, max_tokens=_PACK_CHUNK, overlap=0)
    return pack_sequences(
        chunks,
        budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS,
        strict=True,
    )


def _fuzzy_decon_oracle_sql() -> str:
    """DuckDB SQL replaying the ENTIRE fuzzy-decontamination path (the d03
    MinHash machinery pointed at a benchmark): 3-shingle md5 hashes, the
    shared _HASH_AB minhash family, banded LSH candidates against the
    benchmark (doc_id % 7 = 0), estimated-jaccard threshold, per-doc
    count + max. k/32 jaccards are exact binary fractions — no rounding.
    Mirrors tests/test_corpus.py::test_decontaminate_fuzzy_matches_duckdb,
    promoted here so the standard oracle-parity harness (and a future
    driver rotation) covers it."""
    from ducktales_spark.queries.dedup import (
        _BAND_ROWS,
        _HASH_AB,
        _NUM_HASHES,
        _P,
    )

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
    return rf"""
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
    ORDER BY doc_id
    """


@register(
    # rotated INTO the driver sweep in round 7 (swapped with a10_global_agg,
    # whose ids are redundantly covered): the fuzzy-decontamination pipeline
    # now has a driver CORRECTNESS row, not just a pytest differential
    "c05_decontaminate_fuzzy",
    survey_ids=(),  # extension: MinHash-LSH (fuzzy) decontamination
    oracle=_fuzzy_decon_oracle_sql(),
)
def c05_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination (corpus.decontaminate mode="fuzzy"):
    benchmark = every 7th document; a corpus doc is contaminated when its
    estimated 3-shingle jaccard to >= 1 benchmark doc clears 0.8 — catches
    token-substituted / re-wrapped leakage that breaks exact 13-grams.
    Plan: ONE corpus doc_id exchange (signature groupBy, reused by the band
    explode and hit count); the benchmark bands broadcast under the size
    guard."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    return decontaminate(docs, bench, mode="fuzzy", threshold=0.8)[
        "hits"
    ].withColumn("n_hits", F.col("n_hits").cast("long"))


@register_extra(
    "c06_split_corpus",
    survey_ids=(),  # extension: deterministic train/val/test split
    oracle="""
    SELECT doc_id,
           CASE
             WHEN (('0x' || substr(md5(doc_id::VARCHAR || ':' || '42'),
                                   1, 15))::BIGINT % 1000000000) / 1e9
                  < 0.9 THEN 'train'
             WHEN (('0x' || substr(md5(doc_id::VARCHAR || ':' || '42'),
                                   1, 15))::BIGINT % 1000000000) / 1e9
                  < 0.95 THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def c06_split_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus splitting (corpus.split_corpus, hash mode):
    90/5/5 train/val/test from the md5-uniform of (doc_id, seed) — a doc's
    split never changes when the corpus grows, zero shuffle, pure
    codegen."""
    from ducktales_spark.corpus import split_corpus

    docs = table(spark, sf_dir, "documents")
    return split_corpus(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}
    ).select("doc_id", "split")


@register(
    # r15 rotation: promoted from EXTRA to the driver sweep (never driver-
    # hashed before); t01_token_count moved to EXTRA to keep the 50 slots
    "t07_repetition",
    survey_ids=(),  # extension: repetition audit (dup lines / bigram mode)
    oracle=r"""
    WITH L AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         x -> len(trim(x)) > 0) AS ls,
             regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents
    ),
    base AS (
      SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
             round((len(ls) - len(list_distinct(ls)))::DOUBLE
                   / greatest(len(ls), 1), 9) AS dup_line_frac,
             ws
      FROM L
    ),
    g AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
            FROM base WHERE len(ws) >= 2)
    ),
    c AS (SELECT doc_id, g, count(*) AS n FROM g GROUP BY 1, 2),
    s AS (
      SELECT doc_id, round(max(n)::DOUBLE / sum(n), 9) AS top_bigram_share
      FROM c GROUP BY 1
    )
    SELECT base.doc_id, n_lines, dup_line_frac,
           coalesce(s.top_bigram_share, 0.0) AS top_bigram_share
    FROM base LEFT JOIN s USING (doc_id)
    ORDER BY base.doc_id
    """,
)
def t07_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition audit signals (queries.text_pipeline.repetition_signals):
    duplicate-line fraction (pure codegen) + top-bigram share (bigram mode
    via the standard shingle-shaped aggregation) over the documents
    table."""
    from ducktales_spark.queries.text_pipeline import repetition_signals

    return repetition_signals(table(spark, sf_dir, "documents"))


def _both_decon_oracle_sql() -> str:
    """DuckDB SQL for mode="both": the c01 exact-13-gram counts FULL OUTER
    JOINed with the c05 fuzzy counts — a doc appears when either test
    fires, with per-mode audit columns (max_jaccard NULL for exact-only
    leaks), exactly the Spark plan's shape."""
    from ducktales_spark.queries.dedup import (
        _BAND_ROWS,
        _HASH_AB,
        _NUM_HASHES,
        _P,
    )

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
        + " AS band_key FROM fz_sig"
        for i in range(n_bands)
    )
    est = (
        "("
        + " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(_NUM_HASHES))
        + f") / {float(_NUM_HASHES)}"
    )
    return rf"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents
    ),
    ex_pos AS (
      SELECT doc_id, ws, unnest(range(1, len(ws) - 11)) AS i
      FROM d WHERE len(ws) >= 13
    ),
    ex_sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5({_GRAM_13}), 1, 15))::BIGINT AS h
      FROM ex_pos
    ),
    ex_b AS (SELECT DISTINCT h FROM ex_sh WHERE doc_id % 7 = 0),
    ex AS (
      SELECT ex_sh.doc_id, count(*) AS n_hits
      FROM ex_sh JOIN ex_b USING (h)
      GROUP BY ex_sh.doc_id
    ),
    fz_pos AS (
      SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
      FROM d WHERE len(ws) >= 3
    ),
    fz_sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' ||
                                 ws[i+2]), 1, 15))::BIGINT AS h64
      FROM fz_pos
    ),
    fz_sig AS MATERIALIZED (
      SELECT doc_id, {mins}
      FROM fz_sh GROUP BY doc_id
    ),
    fz_bands AS MATERIALIZED ({band_rows}),
    fz_cand AS (
      SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS bench_id
      FROM fz_bands a
      JOIN fz_bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
      WHERE b.doc_id % 7 = 0
    ),
    fz_scored AS (
      SELECT fz_cand.doc_id, fz_cand.bench_id, {est} AS est
      FROM fz_cand
      JOIN fz_sig sa ON sa.doc_id = fz_cand.doc_id
      JOIN fz_sig sb ON sb.doc_id = fz_cand.bench_id
    ),
    fz AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits_fuzzy,
             max(est) AS max_jaccard
      FROM fz_scored WHERE est >= 0.8
      GROUP BY doc_id
    )
    SELECT coalesce(ex.doc_id, fz.doc_id) AS doc_id,
           CAST(coalesce(ex.n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(fz.n_hits_fuzzy, 0) AS n_hits_fuzzy,
           fz.max_jaccard
    FROM ex FULL OUTER JOIN fz ON ex.doc_id = fz.doc_id
    ORDER BY doc_id
    """


@register(
    # promoted from EXTRA to the driver sweep in round 8 (swapped with
    # x06_sessionize_batch): the combined mode exercises the exact+fuzzy
    # full-outer audit join that neither c01 nor c05 alone covers
    "c07_decontaminate_both",
    survey_ids=(),  # extension: combined exact+fuzzy decontamination
    oracle=_both_decon_oracle_sql(),
)
def c07_decontaminate_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined decontamination (corpus.decontaminate mode="both"):
    benchmark = every 7th document; a doc is flagged when EITHER the exact
    13-gram test or the fuzzy est-jaccard>=0.8 test fires, with per-mode
    audit columns — the full-outer-join of the c01 and c05 count tables."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    hits = decontaminate(docs, bench, mode="both", threshold=0.8)["hits"]
    return hits.select(
        "doc_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        F.col("n_hits_fuzzy").cast("long").alias("n_hits_fuzzy"),
        "max_jaccard",
    )
