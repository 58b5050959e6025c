"""Text-analysis operators over the documents table (extensions; a core
piece of a training-data pipeline at 100 TB).

Everything here is built-in JVM expressions (regexp/split/length/md5) — no
Python in the hot path, so these run at parquet-scan speed and stay inside
whole-stage codegen. All are embarrassingly parallel (no shuffle except the
final aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ducktales_spark.data import plan_memo, table
from ducktales_spark.registry import register, register_extra

# Tiny deterministic english stopword list for the n-gram language heuristic.
_EN_STOP = r"\b(the|and|of|to|in|is|a|for|on|with)\b"

# GPT-2-style pre-tokenizer shape, restricted to constructs RE2 (DuckDB) and
# Java regex (Spark) treat identically: optional leading space + letter run /
# digit run / punctuation run.
_BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization, shared by the text + dedup operators."""
    return F.split(F.trim(text), r"\s+")


@register_extra(
    # r15 rotation: t01 -> EXTRA (its DuckDB differential stays pytest-
    # enforced), t07_repetition takes the driver slot — the standing
    # policy of cycling never-driver-hashed oracles through the sweep.
    # t01's text family stays driver-swept via t02/t05/t06.
    "t01_token_count",
    survey_ids=(),  # extension: token counting (whitespace + BPE-ish regex)
    oracle=rf"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER)
               AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_seen,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INTEGER)
               AS n_bpe_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_RE}')))
               AS INTEGER) AS n_distinct_tokens
    FROM documents
    """,
)
def t01_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per document, both units a training-data token budget
    is measured in: whitespace tokens + chars, and BPE-style pre-tokenization
    (the regex split a GPT-2/tiktoken BPE applies before merges: letter runs,
    digit runs, punctuation runs with attached leading space). JVM
    regexp_extract_all; no Python."""
    d = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars_seen"),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


@register(
    "t02_quality_score",
    survey_ids=(),  # extension: quality scoring + language-ID heuristic
    oracle=rf"""
    SELECT doc_id, lang,
           CAST(length(text) AS INTEGER) AS n_chars,
           round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 6) AS alpha_ratio,
           round(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 2)
               AS n_words,
           round(CAST(length(text) AS DOUBLE)
                 / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 6)
               AS chars_per_word,
           CAST(len(regexp_extract_all(lower(text), '{_EN_STOP}')) AS INTEGER)
               AS n_en_stopwords,
           round(CAST(len(regexp_extract_all(lower(text), '{_EN_STOP}')) AS DOUBLE)
                 / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 6)
               AS en_stopword_ratio
    FROM documents
    WHERE length(text) >= 20
    """,
)
@plan_memo
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features (length, alphabetic ratio, words-per-doc,
    chars-per-word — the length/punct family) + the stopword-ratio language
    signal (n-gram heuristic family), in one pushed scan."""
    d = table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    n_words = F.size(tokens(F.col("text")))
    n_stop = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_EN_STOP), 0))
    return d.filter(n_chars >= 20).select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars"),
        F.round(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias(
            "alpha_ratio"
        ),
        F.round(n_words.cast("double"), 2).alias("n_words"),
        F.round(
            n_chars.cast("double") / F.greatest(n_words, F.lit(1)), 6
        ).alias("chars_per_word"),
        n_stop.alias("n_en_stopwords"),
        F.round(n_stop.cast("double") / F.greatest(n_words, F.lit(1)), 6).alias(
            "en_stopword_ratio"
        ),
    )


@register_extra(
    "t04_fingerprint",
    survey_ids=(),  # extension: document fingerprinting
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS fingerprint
    FROM documents
    """,
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint: lowercase, collapse non-alnum runs,
    md5 — stable under whitespace/punctuation edits."""
    d = table(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    )
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))


@register(
    # promoted to the driver sweep in round 6 (was EXTRA): the corpus
    # composition report is a first-class pipeline capability;
    # j03_semi_anti rotated down to make room.
    "t06_corpus_report",
    survey_ids=(),  # extension: corpus-composition analytics
    oracle=r"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS total_words,
           round(avg(len(regexp_split_to_array(trim(text), '\s+'))), 6)
               AS mean_words,
           round(quantile_cont(
               len(regexp_split_to_array(trim(text), '\s+')), 0.5), 6)
               AS median_words,
           round(quantile_cont(
               len(regexp_split_to_array(trim(text), '\s+')), 0.95), 6)
               AS p95_words,
           round(avg(length(text)), 6) AS mean_chars
    FROM documents
    GROUP BY source
    """,
)
def t06_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition report: doc counts, token totals, and
    the length distribution (mean/median/p95 words, mean chars) — the
    audit a mixture designer reads before setting mix_corpus weights.
    Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`) so the whole report cross-checks as a differential;
    one scan, one shuffle on the group key, all JVM."""
    d = table(spark, sf_dir, "documents")
    w = F.size(tokens(F.col("text"))).cast("double")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(w).cast("bigint").alias("total_words"),
        F.round(F.avg(w), 6).alias("mean_words"),
        F.round(F.expr(
            r"percentile(cast(size(split(trim(text), '\\s+')) as double), 0.5)"
        ), 6).alias("median_words"),
        F.round(F.expr(
            r"percentile(cast(size(split(trim(text), '\\s+')) as double), 0.95)"
        ), 6).alias("p95_words"),
        F.round(F.avg(F.length("text")), 6).alias("mean_chars"),
    )
