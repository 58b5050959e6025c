"""Scalar-function operators F1-F11 (SURVEY.md §2.8) + date/time extensions.

All JVM-side built-ins — no Python UDFs anywhere on these paths, so every
expression stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ducktales_spark.data import table
from ducktales_spark.registry import register, register_extra


@register_extra(
    # rotated to the EXTRA tier in round 5 (F1/P1 stay driver-covered by
    # p02_expr_concat) to free a driver slot for i01_interval_join; the
    # full DuckDB differential still runs in pytest
    "f01_string_funcs",
    survey_ids=("F1", "P1"),
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                        AS brand_uc,
           lower(p_type)                         AS type_lc,
           substr(p_name, 1, 10)                 AS name_prefix,
           CAST(length(p_name) AS INTEGER)       AS name_len,
           p_brand || ':' || p_type              AS brand_type
    FROM part
    """,
)
def f01_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: upper/lower/substr/length/concat (F1 + extensions)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    )


@register_extra(
    "f05_date_arith",
    survey_ids=("F4", "F5"),
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY             AS due_ts,
           CAST(o_orderdate AS DATE)                 AS order_date,
           CAST(year(o_orderdate) AS INTEGER)        AS order_year,
           CAST(month(o_orderdate) AS INTEGER)       AS order_month,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders
    """,
)
def f05_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/date arithmetic + date part extraction + date_trunc (reference:
    utils/ducklake_utils.py:108; exploration/ducklake_analysis.sh:90)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@register_extra(
    # rotated to EXTRA in round 6: F6 is redundantly covered by
    # f02_gen_invariants' driver row; the DuckDB differential still runs
    # in pytest (test_oracle_parity) — the slot went to c04_pack_strict.
    "f06_casts",
    survey_ids=("F6",),
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR)        AS key_str,
           CAST(o_totalprice AS BIGINT)       AS price_int,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
           CAST(o_orderdate AS DATE)          AS order_date
    FROM orders
    WHERE o_orderkey % 13 = 0
    """,
)
def f06_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family ::VARCHAR ::BIGINT ::DECIMAL ::DATE (reference:
    exploration/ducklake_analysis.sh:88-91).

    Notes: double->BIGINT rounds half-to-even in DuckDB (ties: 490342.5 ->
    490342) but truncates in ANSI SQL; Spark matches DuckDB via BROUND
    (banker's rounding) — plain ROUND is HALF_UP and diverges on .5 ties.
    The DECIMAL(12,2) cast is surfaced as its canonical string on BOTH sides:
    the round-1 driver hash fed Spark's Decimal and DuckDB's Decimal through
    different representations even though every value compared equal
    (verified across all of sf0.1); the string form is engine-neutral.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return o.select(
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.bround("o_totalprice", 0).cast("bigint").alias("price_int"),
        F.col("o_totalprice")
        .cast(T.DecimalType(12, 2))
        .cast("string")
        .alias("price_dec"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@register(
    "f08_json",
    survey_ids=("F8", "F9"),
    oracle="""
    SELECT event_id,
           json_valid(props)                                AS is_valid,
           json_extract_string(props, '$.k')                AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
)
def f08_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_valid predicate + json_extract_string + typed use in a predicate
    (reference: demos/03_schema_evolution/demo.py:283-284).

    Spark has no json_valid builtin; `get_json_object` against the root path
    returns NULL exactly when the document fails to parse — same observable
    semantics, still JVM-side.
    """
    e = table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    )
    return e.filter(F.col("k_num") > 90)


@register(
    "f02_gen_invariants",
    # Also absorbs the former s04_range_generator entry (S4/P2/F5/F6): the
    # registry is capped at the driver's 50-query sweep, and both demos are
    # generator-family — one query carries the union of their survey ids.
    survey_ids=("F2", "F3", "F4", "S4", "A10", "P2", "F5", "F6"),
    oracle="""
    SELECT CAST(range AS BIGINT)                      AS id,
           CAST(range % 10 AS BIGINT)                 AS bucket,
           DATE '2024-01-01' + CAST(range % 365 AS INTEGER) AS d,
           CAST(1 AS BOOLEAN) AS rand_in_range,
           CAST(1 AS BOOLEAN) AS now_recent,
           CAST(1 AS BOOLEAN) AS interval_works
    FROM range(0, 1000)
    """,
)
def f02_gen_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range(n) synthetic generator with derived columns — the reference's
    data-gen pattern (utils/ducklake_utils.py:107-109,
    exploration/benchmark_ducklake.sh:76) — plus random()/NOW()/interval
    arithmetic. spark.range parallelizes the sequence across partitions (no
    driver materialization). The random/now values are non-deterministic by
    design, so the oracle-checked contract for them is the deterministic
    per-row envelope: 0 <= rand() < 1, now() is after 2024, and
    now() - INTERVAL 7 DAYS < now()."""
    return spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("bucket"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("id") % 365).cast("int")
        ).alias("d"),
        ((F.rand(seed=42) >= 0) & (F.rand(seed=43) < 1)).alias(
            "rand_in_range"
        ),
        (F.year(F.current_timestamp()) >= 2024).alias("now_recent"),
        (
            F.current_timestamp() - F.expr("INTERVAL 7 DAYS")
            < F.current_timestamp()
        ).alias("interval_works"),
    )


@register(
    "s09_introspection",
    survey_ids=("S9",),
    oracle="""
    SELECT * FROM (VALUES
        ('function', 'min',                          CAST(1 AS BOOLEAN)),
        ('function', 'min_by',                       CAST(1 AS BOOLEAN)),
        ('function', 'minute',                       CAST(1 AS BOOLEAN)),
        ('setting',  'spark.sql.adaptive.enabled',   CAST(1 AS BOOLEAN)),
        ('setting',  'spark.sql.shuffle.partitions', CAST(1 AS BOOLEAN)),
        ('setting',  'spark.sql.session.timeZone',   CAST(1 AS BOOLEAN))
    ) AS t(kind, name, has_value)
    ORDER BY kind, name
    """,
)
def s09_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_functions()/duckdb_settings() equivalent: SHOW FUNCTIONS +
    spark.conf settings (exploration/ducklake_analysis.sh:188-191,
    exploration/schema_analysis.sh:36-43). Function/setting NAMES are the
    deterministic contract (pinned Spark version); setting VALUES are
    session-dependent, so the oracle checks presence (has_value)."""
    fns = spark.sql("SHOW FUNCTIONS LIKE 'min*'").select(
        F.lit("function").alias("kind"),
        F.col("function").alias("name"),
        F.lit(True).alias("has_value"),
    )
    settings = [
        "spark.sql.adaptive.enabled",
        "spark.sql.shuffle.partitions",
        "spark.sql.session.timeZone",
    ]
    def _has(s: str) -> bool:
        # conf.get(key, default) SKIPS built-in SQL defaults — in a vanilla
        # session unset keys would come back None. No-default get resolves
        # them (e.g. shuffle.partitions -> "200") in any session.
        try:
            return spark.conf.get(s) is not None
        except Exception:
            return False

    rows = [("setting", s, _has(s)) for s in settings]
    sdf = spark.createDataFrame(rows, "kind string, name string, has_value boolean")
    return fns.unionByName(sdf).orderBy("kind", "name")
