"""Chunking + PII redaction: exact-value tests for the pipeline text ops."""

from __future__ import annotations

from ducktales_spark.queries.text_pipeline import chunk_documents, redact_pii

import pytest
from pyspark.sql import functions as F


def test_redact_pii_shapes(spark):
    rows = [
        (1, "mail bob.smith+x@example.co.uk now"),
        (2, "card 4111 1111 1111 1111 on file"),
        (3, "ssn 123-45-6789 leaked"),
        (4, "host 192.168.0.1 up"),
        (5, "call +1 (555) 123-4567 or 555-987-6543"),
        (6, "clean text with number 42 and version 1.2.3"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    got = {
        r.id: r.red
        for r in df.select("id", redact_pii(F.col("text")).alias("red")).collect()
    }
    assert got[1] == "mail [EMAIL] now"
    assert got[2] == "card [CARD] on file"
    assert got[3] == "ssn [SSN] leaked"
    assert got[4] == "host [IP] up"
    assert got[5] == "call [PHONE] or [PHONE]"
    assert got[6] == "clean text with number 42 and version 1.2.3"


def test_chunk_documents_exact(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b"), (3, "")],
        "doc_id bigint, text string",
    )
    out = chunk_documents(df, max_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.n_chunk_tokens, r.chunk))
    # doc 1: 10 tokens, step 3 -> ceil(9/3)=3 chunks: [0:4],[3:7],[6:10]
    assert by_doc[1] == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
    ]
    # short doc: one chunk, unchanged
    assert by_doc[2] == [(0, 2, "a b")]
    # empty doc: one empty chunk (coverage accounting, not silent drop)
    assert by_doc[3][0][0] == 0 and by_doc[3][0][2] == ""

    # every token position is covered and consecutive chunks overlap by 1
    out2 = chunk_documents(df.filter("doc_id = 1"), max_tokens=4, overlap=1)
    toks = [r.chunk.split() for r in sorted(out2.collect(), key=lambda r: r.chunk_id)]
    assert toks[0][-1] == toks[1][0] and toks[1][-1] == toks[2][0]
    assert sorted(set().union(*toks)) == sorted(words)


def test_chunk_documents_boundary_counts(spark):
    # n == max_tokens -> 1 chunk; n == max_tokens+1 -> 2 chunks
    mk = lambda n: " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame(
        [(512, mk(512)), (513, mk(513)), (960, mk(960)), (961, mk(961))],
        "doc_id bigint, text string",
    )
    counts = {
        r.doc_id: r.c
        for r in chunk_documents(df, max_tokens=512, overlap=64)
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert counts == {512: 1, 513: 2, 960: 2, 961: 3}


def test_chunk_documents_no_python_no_shuffle(spark):
    """The chunker must stay a codegen projection: no Python eval, no
    exchange — at 100 TB it runs at scan speed."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    plan = (
        chunk_documents(df, max_tokens=3, overlap=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_chunk_documents_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


_SAMPLES = [
    ("en", "The quick brown fox jumps over the lazy dog and runs into the "
           "forest to find something interesting in the morning light."),
    ("en", "This is an example of a reasonably long English sentence that "
           "should be easy for the classifier to identify correctly."),
    ("fr", "Le chat noir dort sur le canapé pendant que la pluie tombe "
           "doucement sur les toits de la ville et que les gens passent."),
    ("fr", "Il faut que nous allions au marché pour acheter des légumes "
           "et du pain avant que les magasins ne ferment ce soir."),
    ("de", "Der schnelle braune Fuchs springt über den faulen Hund und "
           "die Kinder spielen im Garten während die Sonne scheint."),
    ("de", "Ich möchte ein schönes Geschenk für meine Schwester kaufen "
           "und wir gehen zusammen in die Stadt um etwas zu finden."),
    ("es", "El perro corre por el parque mientras los niños juegan en la "
           "plaza y las familias disfrutan de la tarde soleada de verano."),
    ("es", "Es necesario que vayamos al mercado para comprar las verduras "
           "que necesitamos para preparar la cena de esta noche."),
]


def test_language_id_real_text(spark):
    from ducktales_spark.queries.text_pipeline import language_id

    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(_SAMPLES)],
        "id bigint, expected string, text string",
    )
    got = df.select(
        "id", "expected", language_id(F.col("text")).alias("lang")
    ).collect()
    wrong = [(r.expected, r.lang) for r in got if r.expected != r.lang]
    assert not wrong, wrong


_LATIN_EXTRA_SAMPLES = [
    ("it", "La volpe marrone veloce salta sopra il cane pigro e i bambini "
           "giocano nel giardino mentre splende il sole della sera."),
    ("it", "Devo andare al mercato per comprare le verdure che servono per "
           "preparare la cena di questa sera prima della chiusura."),
    ("nl", "De snelle bruine vos springt over de luie hond en de kinderen "
           "spelen in de tuin terwijl de zon schijnt vanavond."),
    ("nl", "Ik moet naar de winkel gaan om brood en melk te kopen voordat "
           "de winkels vanavond sluiten in het centrum van de stad."),
    ("pt", "A raposa marrom rápida salta sobre o cão preguiçoso e as "
           "crianças brincam no jardim enquanto o sol brilha."),
    ("pt", "Preciso de ir ao mercado para comprar os legumes de que "
           "precisamos para preparar o jantar desta noite."),
]


def test_language_id_extra_latin_profiles(spark):
    from ducktales_spark.queries.text_pipeline import language_id

    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(_LATIN_EXTRA_SAMPLES)],
        "id bigint, expected string, text string",
    )
    got = df.select(
        "id", "expected", language_id(F.col("text")).alias("lang")
    ).collect()
    wrong = [(r.expected, r.lang) for r in got if r.expected != r.lang]
    assert not wrong, wrong


_NONLATIN_SAMPLES = [
    ("ru", "Быстрая коричневая лиса прыгает через ленивую собаку, а дети "
           "играют в саду, пока светит солнце."),
    ("ru", "Мне нужно пойти в магазин и купить хлеба и молока до того, как "
           "магазины закроются сегодня вечером."),
    ("zh", "敏捷的棕色狐狸跳过了懒惰的狗。孩子们在花园里玩耍,阳光明媚。"),
    ("zh", "我需要去市场买一些蔬菜,准备今天晚上的晚饭。商店很快就要关门了。"),
    ("ja", "素早い茶色の狐が怠け者の犬を飛び越えます。子供たちは庭で遊んで"
           "います。"),
    ("ja", "今晩の夕食のために野菜を買いに市場へ行く必要があります。"),
    ("ko", "빠른 갈색 여우가 게으른 개를 뛰어넘습니다. 아이들은 해가 비치는 "
           "동안 정원에서 놀고 있습니다."),
    ("ar", "الثعلب البني السريع يقفز فوق الكلب الكسول ويلعب الأطفال في "
           "الحديقة بينما تشرق الشمس."),
    ("el", "Η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο σκυλί και τα "
           "παιδιά παίζουν στον κήπο."),
    ("hi", "तेज़ भूरी लोमड़ी आलसी कुत्ते के ऊपर कूदती है और बच्चे बगीचे में खेलते हैं।"),
]


def test_language_id_nonlatin_scripts(spark):
    """The unicode-block script gate: non-Latin text must label at script
    level, never fall through to 'und' or a Latin profile."""
    from ducktales_spark.queries.text_pipeline import language_id

    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(_NONLATIN_SAMPLES)],
        "id bigint, expected string, text string",
    )
    got = df.select(
        "id", "expected", language_id(F.col("text")).alias("lang")
    ).collect()
    wrong = [(r.expected, r.lang) for r in got if r.expected != r.lang]
    assert not wrong, wrong


def test_language_id_script_gate_stays_codegen(spark):
    """The gate must stay a pure projection: no Python eval, no shuffle."""
    from ducktales_spark.queries.text_pipeline import language_id

    df = spark.createDataFrame([(1, "текст")], "id bigint, text string")
    out = df.select(language_id(F.col("text")).alias("lang"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_language_id_undetermined(spark):
    from ducktales_spark.queries.text_pipeline import language_id

    df = spark.createDataFrame(
        [(1, "xyzzy qwrk 12345 ####"), (2, "")],
        "id bigint, text string",
    )
    got = {r.id: r.lang for r in df.select(
        "id", language_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "und", 2: "und"}


def test_language_scores_shape_and_plan(spark):
    from ducktales_spark.queries.text_pipeline import language_scores

    df = spark.createDataFrame([(1, _SAMPLES[0][1])], "id bigint, text string")
    out = df.select(language_scores(F.col("text")).alias("m"))
    m = out.first().m
    assert set(m) == {"de", "en", "es", "fr", "it", "nl", "pt"}
    assert m["en"] == max(m.values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_quality_filter_rules(spark):
    from ducktales_spark.queries.text_pipeline import quality_filter

    good = ("The house on the hill is quiet and the garden behind it is "
            "full of flowers that bloom in spring when warm weather "
            "returns and days grow long. Children walk past every morning "
            "carrying bright bags while neighbors water small plants near "
            "wooden fences, discussing plans for summer trips to distant "
            "mountain villages where rivers run cold and clear.")
    rows = [
        (1, good),                                  # keep
        (2, "too short to pass the gate"),          # too_few_words (+no_stop?)
        (3, "#### #### " + " ".join(["###"] * 60)), # symbols, no stopwords
        (4, ("spam " * 80).strip()),                # repetition, no_stopword
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in quality_filter(df, min_words=50).collect()}
    assert out[1].keep and out[1].reasons == []
    assert not out[2].keep and "too_few_words" in out[2].reasons
    assert not out[3].keep and "symbol_ratio" in out[3].reasons
    assert not out[4].keep and "repetition" in out[4].reasons

    # single codegen projection: no Python, no exchange
    plan = (quality_filter(df)._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_quality_keep_matches_filter_on_nulls(spark):
    """Batch and streaming quality gates must agree on EVERY doc, including
    NULL/indeterminate text: quality_filter's reasons array is empty for a
    NULL doc (kept), so quality_keep must coalesce its exists() NULL to
    keep as well — a batch/streaming divergence here silently changes the
    corpus between the two ingest paths."""
    from ducktales_spark.queries.text_pipeline import (
        quality_filter,
        quality_keep,
    )

    rows = [
        (1, None),
        (2, "too short"),
        (3, ("The house on the hill is quiet and the garden behind it is "
             "full of flowers that bloom in spring when the warm weather "
             "returns and the days grow long for everyone in the village "
             "near the river that runs to the sea past old stone bridges "
             "and tall green trees that line both banks in summer.")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    batch = {
        r.doc_id: r.keep for r in quality_filter(df, min_words=20).collect()
    }
    stream_face = {
        r.doc_id: r.k
        for r in df.select(
            "doc_id",
            quality_keep(F.col("text"), min_words=20).alias("k"),
        ).collect()
    }
    assert batch == stream_face
    assert batch[1] is True  # NULL text: kept by both, not dropped by one
    # and a filter over the keep column behaves identically to the batch cut
    kept = {r.doc_id for r in df.filter(
        quality_keep(F.col("text"), min_words=20)
    ).collect()}
    assert kept == {d for d, k in batch.items() if k}


def test_repetition_signals_planted(spark):
    """Template spam scores high dup_line_frac; keyword stuffing ("buy now"
    looping — invisible to the distinct-WORD ratio once two words repeat in
    order) scores high top_bigram_share; natural text scores low on both;
    a one-word doc has no bigrams and scores 0."""
    from ducktales_spark.queries.text_pipeline import repetition_signals

    spam_lines = "real header\n" + "same line\n" * 9
    stuffing = "buy now " * 50
    natural = " ".join(f"w{i}" for i in range(100)) + "\nsecond line here"
    docs = spark.createDataFrame(
        [(1, spam_lines), (2, stuffing), (3, natural), (4, "single")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert out[1].n_lines == 10 and out[1].dup_line_frac == 0.8
    assert out[2].top_bigram_share > 0.49  # "now buy"/"buy now" dominate
    assert out[3].dup_line_frac == 0.0 and out[3].top_bigram_share < 0.05
    assert out[4].n_lines == 1 and out[4].top_bigram_share == 0.0
