"""Training-data pipeline text operators: document chunking and PII
redaction. Library operators (not registry queries): pure JVM expressions —
regexp/split/slice inside whole-stage codegen, no Python, no shuffle. Both
are embarrassingly parallel and scale as a projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher-style quality rules (Rae et al. 2021, table A1 family): name ->
# (predicate builder over the doc text, as a FAILURE condition). Word/char
# heuristics only — everything a JVM expression can see.
def _quality_rules(min_words: int, max_words: int):
    def rules(text: Column) -> list:
        ws = F.split(F.trim(text), r"\s+")
        n_words = F.size(ws)
        n_chars = F.length(text)
        mean_wl = n_chars.cast("double") / F.greatest(n_words, F.lit(1))
        alpha = (
            F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
            / F.greatest(n_chars, F.lit(1))
        )
        stop = F.size(
            F.regexp_extract_all(F.lower(text), F.lit(_EN_STOPWORDS), 0)
        )
        hash_ratio = (
            F.size(F.regexp_extract_all(text, F.lit(r"[#\.]{3,}|#"), 0))
            .cast("double") / F.greatest(n_words, F.lit(1))
        )
        distinct_ratio = (
            F.size(F.array_distinct(ws)).cast("double")
            / F.greatest(n_words, F.lit(1))
        )
        return [
            ("too_few_words", n_words < min_words),
            ("too_many_words", n_words > max_words),
            ("mean_word_length", (mean_wl < 3) | (mean_wl > 10)),
            ("symbol_ratio", hash_ratio > 0.1),
            ("alpha_ratio", alpha < 0.6),
            ("no_stopword", stop < 2),
            ("repetition", distinct_ratio < 0.3),
        ]

    return rules


_EN_STOPWORDS = r"\b(the|and|of|to|in|is|a|for|on|with|that|be|are)\b"


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style composite quality gate: (doc_id, keep, reasons).

    ``reasons`` lists every failed rule (empty array when keep) — a filter
    that only says "dropped" is undebuggable at corpus scale; per-reason
    counts are how a pipeline audits what a rule change did. One codegen
    projection over the scan, no shuffle, no Python; the rule set is the
    word/char family (counts, mean word length, symbol + alphabetic
    ratios, stopword presence, distinct-word repetition)."""
    rules = _quality_rules(min_words, max_words)(F.col(text_col))
    reasons = F.filter(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        reasons.alias("reasons"),
    ).select(
        "doc_id", (F.size("reasons") == 0).alias("keep"), "reasons"
    )


def quality_keep(
    text: Column, min_words: int = 50, max_words: int = 100_000
) -> Column:
    """The quality gate as a single boolean Column — same rules as
    quality_filter, composable directly onto a STREAMING DataFrame (where
    the audit-table formulation would need a stream-stream self-join).
    ``stream.filter(quality_keep(F.col("text"), ...))`` is the streaming
    face of the batch pipeline's quality stage.

    NULL policy matches quality_filter exactly: an indeterminate rule
    (NULL text -> NULL condition) is NOT a failure there (the when()
    projection maps NULL conditions to no reason), so ``exists`` NULLs are
    coalesced to false here — both gates keep null/indeterminate docs."""
    rules = _quality_rules(min_words, max_words)(text)
    failed = F.array(*[cond for _, cond in rules])
    return ~F.coalesce(F.exists(failed, lambda x: x), F.lit(False))


# Redaction patterns, most-specific first so a card number is not half-eaten
# by the phone pattern. Java regex (Spark executes these JVM-side).
_PII_PATTERNS = (
    # local@domain.tld
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    # 13-19 digits in groups of 3-6 separated by space/dash (card-shaped)
    ("card", r"\b(?:\d[ -]?){12,18}\d\b"),
    # 123-45-6789 (SSN-shaped)
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    # dotted quad
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    # +1 (555) 123-4567 / 555-123-4567 / 5551234567 (7+ digits with optional
    # separators and country code)
    ("phone", r"(?<![\w.])\+?\d{0,2}[ .-]?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b"),
)


# Character-trigram profiles: the ~20 most frequent trigrams of each
# language (space-padded, from public frequency tables). Tiny on purpose —
# the operator's job is the SPARK SHAPE of n-gram language ID (per-language
# alternation counts, one codegen projection); swapping in fuller profiles
# (or more languages) changes only this dict.
_LANG_PROFILES = {
    "de": ["en ", "er ", " de", "der", "ie ", " di", "die", "ein", "ich",
           "nd ", " un", "und", "ch ", "sch", "ung", " ei", "ne ", "che",
           "ten", " ge"],
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ion",
           " to", "to ", "ing", "ng ", " in", "in ", "er ", "at ", "tio",
           "ent", " is"],
    "es": [" de", "de ", "os ", " la", "la ", " el", "el ", "as ", "ión",
           " en", "en ", "ent", " qu", "que", "ue ", "ado", " co", "est",
           "cio", "ar "],
    "fr": [" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion",
           "nt ", "que", " qu", "ue ", " et", "et ", " pa", "tio", "les",
           "on ", " co"],
    "it": [" di", "di ", "to ", "la ", " la", "re ", " co", "che", " ch",
           "he ", "no ", "one", "ne ", " pe", "per", "ell", "lla", "are",
           " un", "ato"],
    "nl": ["en ", " de", "de ", "et ", " he", "het", "an ", " va", "van",
           "een", " ee", "ijn", "ij ", "wij", "aar", "aan", "oor", "nde",
           "cht", " zo"],
    "pt": [" de", "de ", "os ", " co", "ão ", "ção", " qu", "que", "ue ",
           " a ", "do ", " do", "da ", " da", " o ", " pa", "par", "ara",
           " se", "es "],
}


def language_scores(text: Column) -> Column:
    """Per-language trigram-hit densities as a map<lang, double>.

    Score = non-overlapping occurrences of the language's profile trigrams
    (one regex alternation per language over the lower-cased, space-padded
    text) divided by text length. All regexp_extract_all + size — a codegen
    projection, no UDF, no shuffle."""
    import re as _re

    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    entries = []
    for lang, tris in sorted(_LANG_PROFILES.items()):
        pat = "|".join(_re.escape(t) for t in tris)
        hits = F.size(F.regexp_extract_all(padded, F.lit(pat), 0))
        entries += [
            F.lit(lang),
            (hits.cast("double") / F.greatest(F.length(text), F.lit(1))),
        ]
    return F.create_map(*entries)


# Unicode-block script gate, checked BEFORE the Latin trigram profiles:
# script membership is a far stronger signal than any n-gram statistic, and
# without it every non-Latin document would fall through to 'und' at best.
# Each entry: label -> character-class regex of the script's main blocks.
# Labels are the dominant language of the script where that's essentially
# unambiguous (ru/ar/hi/el/he/ko), and resolved han+kana -> ja / han -> zh
# for CJK. Swap point for finer resolution (e.g. a Cyrillic uk/bg profile
# pass) exactly like _LANG_PROFILES.
_SCRIPT_BLOCKS = (
    # kana is uniquely Japanese — checked first so han+kana text is 'ja'
    ("ja", "[぀-ヿ]"),
    ("ko", "[가-힯ᄀ-ᇿ㄰-㆏]"),
    ("zh", "[一-鿿㐀-䶿]"),
    ("ru", "[Ѐ-ӿ]"),
    ("ar", "[؀-ۿݐ-ݿ]"),
    ("hi", "[ऀ-ॿ]"),
    ("el", "[Ͱ-Ͽ]"),
    ("he", "[֐-׿]"),
)
# kana runs lighter than han in real Japanese text (okurigana between kanji):
# its decisive threshold is lower than the other scripts'.
_KANA_RATIO = 0.05
_SCRIPT_RATIO = 0.25


def language_id(text: Column, min_score: float = 0.01) -> Column:
    """Best-scoring language code, or 'und' (undetermined) when even the
    best density is under ``min_score`` (e.g. word-soup, code, scripts no
    block/profile covers). Two stages, both codegen projections:

    1. script gate — per-script character ratios over the non-whitespace
       length; a decisive script (>= 25%, kana >= 5%) labels immediately;
    2. Latin trigram profiles (_LANG_PROFILES) for everything else. Ties
       break to the lexicographically-last language (array_max over
       (score, lang) structs — exact ties are vanishingly rare on real
       text)."""
    import re as _re

    n_visible = F.greatest(
        F.length(F.regexp_replace(text, r"\s", "")), F.lit(1)
    ).cast("double")
    script_label = None
    for label, block in reversed(_SCRIPT_BLOCKS):
        ratio = (
            F.size(F.regexp_extract_all(text, F.lit(block), 0)).cast("double")
            / n_visible
        )
        threshold = _KANA_RATIO if label == "ja" else _SCRIPT_RATIO
        hit = F.when(ratio >= threshold, F.lit(label))
        script_label = (
            hit.otherwise(script_label) if script_label is not None else hit
        )

    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    structs = []
    for lang, tris in sorted(_LANG_PROFILES.items()):
        pat = "|".join(_re.escape(t) for t in tris)
        hits = F.size(F.regexp_extract_all(padded, F.lit(pat), 0))
        structs.append(
            F.struct(
                (hits.cast("double") / F.greatest(F.length(text), F.lit(1)))
                .alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*structs))
    latin = F.when(best["score"] >= min_score, best["lang"]).otherwise(
        F.lit("und")
    )
    return F.coalesce(script_label, latin)


# The subset of _PII_PATTERNS whose regexes mean the same thing under Java
# regex (Spark) and RE2 (DuckDB) — everything except phone, whose
# false-positive guard is a lookbehind RE2 doesn't support. This is what the
# cross-engine registry query (t05) redacts with; the library default keeps
# the full set.
PII_PATTERNS_RE2_SAFE = tuple(p for p in _PII_PATTERNS if p[0] != "phone")


def redact_pii(text: Column, patterns=_PII_PATTERNS) -> Column:
    """Replace email / card / SSN / IP / phone shapes with [TYPE] tags.

    A chain of regexp_replace expressions — one codegen'd projection, no
    UDF. Pattern order is significant (see _PII_PATTERNS). Recall-oriented
    like every regex PII pass: shapes, not checksums (a Luhn check would
    need a UDF for marginal precision on fake-but-card-shaped numbers).
    """
    out = text
    for tag, pat in patterns:
        out = F.regexp_replace(out, pat, f"[{tag.upper()}]")
    return out


def bpe_pieces(text: Column) -> Column:
    """GPT-2-style pre-tokenizer pieces — letter runs, digit runs,
    punctuation runs, each with its attached leading space — as a JVM
    regexp_extract_all (the same regex family queries.text.t01 counts
    with). Each piece maps to >= 1 BPE token, so a budget measured in
    pieces tracks a real BPE token budget far more closely than
    whitespace words do, with zero Python in the plan.

    Pieces carry their own separators, so ``joiner=""`` reassembles them
    losslessly for text whose characters the piece regex covers (runs of
    whitespace beyond a single inter-piece space are not representable —
    normalize whitespace upstream if byte-exact chunks matter)."""
    from ducktales_spark.queries.text import _BPE_RE

    return F.regexp_extract_all(text, F.lit(_BPE_RE), 0)


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
    tokenizer=None,
    joiner: str = " ",
) -> DataFrame:
    """Split documents into overlapping token-budget chunks:
    (doc_id, chunk_id, n_chunk_tokens, chunk).

    Tokenize once into a word array, explode the chunk-index range, slice
    the array per chunk — all JVM array expressions, so the only data
    amplification is the emitted chunks themselves (overlap/max_tokens
    extra bytes).

    The token UNIT is pluggable: ``tokenizer`` is any Column -> Column
    function producing the array the budget counts (default: whitespace
    words), and ``joiner`` must invert it when reassembling chunk text
    (" " for whitespace words; "" for ``bpe_pieces``, whose pieces carry
    their leading space). ``n_chunk_tokens`` is counted in the chosen
    unit, so downstream ``pack_sequences`` budgets inherit it unchanged —
    pass ``tokenizer=bpe_pieces, joiner=""`` and the whole chunk->pack
    path budgets in BPE-piece units with no Python added to the plan.

    Chunks start every ``max_tokens - overlap`` tokens; the last chunk is
    the only one shorter than ``max_tokens``, and a document shorter than
    ``max_tokens`` yields exactly one chunk. Empty/whitespace-only docs
    yield one empty chunk (kept: dropping rows silently would make chunk
    counts lie about corpus coverage; filter upstream if unwanted).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    ws = (
        tokenizer(F.col(text_col))
        if tokenizer is not None
        else F.split(F.trim(F.col(text_col)), r"\s+")
    )
    n = F.size(ws)
    # number of chunk starts: 1 + floor(max(n - max_tokens, 0) / step),
    # +1 more if a tail remains beyond the last full window
    n_chunks = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step))).cast("int"),
    )
    tokenized = docs.select(
        F.col(id_col).alias("doc_id"), ws.alias("__ws"), n_chunks.alias("__nc")
    )
    exploded = tokenized.select(
        "doc_id",
        "__ws",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
    )
    chunk_ws = F.slice(
        F.col("__ws"), F.col("chunk_id") * step + 1, max_tokens
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(chunk_ws).alias("n_chunk_tokens"),
        F.concat_ws(joiner, chunk_ws).alias("chunk"),
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/FineWeb-style repetition audit: (doc_id, n_lines,
    dup_line_frac, top_bigram_share).

    * ``dup_line_frac`` — fraction of non-blank lines that are duplicates
      of an earlier line (template spam, boilerplate headers/footers).
      Pure codegen: split + array_distinct, no shuffle.
    * ``top_bigram_share`` — the most frequent word bigram's share of all
      bigrams (a high share marks keyword-stuffed / looping text that the
      distinct-WORD ratio misses: "buy now buy now ..." has only two
      distinct words repeated in ORDER). Needs the bigram mode, so this
      leg costs two aggregations riding the standard shingle shape
      (partial map-side combine, then per-doc max/sum) — shuffle volume is
      the distinct (doc, bigram) set, the d02 scale envelope. Docs with
      fewer than two words score 0.

    Ratios round to 9 dp so the DuckDB oracle hash-matches exactly.
    Compose with quality_filter as a second gate: these signals need a
    shuffle, so pipelines run the zero-shuffle rules first and this audit
    on the survivors."""
    text = F.col(text_col)
    lines = F.filter(
        F.split(text, "\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_lines = F.size(lines)
    dup = (
        (n_lines - F.size(F.array_distinct(lines))).cast("double")
        / F.greatest(n_lines, F.lit(1))
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_lines.cast("bigint").alias("n_lines"),
        F.round(dup, 9).alias("dup_line_frac"),
        F.split(F.trim(text), r"\s+").alias("__ws"),
    )
    grams = (
        base.filter(F.size("__ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__ws) - 2), "
                    "i -> concat(__ws[i], ' ', __ws[i + 1]))"
                )
            ).alias("g"),
        )
    )
    shares = (
        grams.groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(
            (F.max("count").cast("double") / F.sum("count")).alias(
                "top_bigram_share"
            )
        )
    )
    return (
        base.drop("__ws")
        .join(shares, "doc_id", "left")
        .withColumn(
            "top_bigram_share",
            F.round(F.coalesce("top_bigram_share", F.lit(0.0)), 9),
        )
    )
