"""Scalar-function operators F1-F11 (SURVEY.md §2.8) + date/time extensions:
string ops, casts, date arithmetic, JSON validity/extraction, tumbling
windows over the events stream table.

All JVM-side built-ins — no Python UDFs anywhere on these paths, so every
expression stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ducktales_spark.data import table
from ducktales_spark.registry import register


@register(
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


@register(
    "f05_date_arith",
    survey_ids=("F4", "F5"),
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY             AS due_ts,
           CAST(o_orderdate AS DATE)                 AS order_date,
           CAST(year(o_orderdate) AS INTEGER)        AS order_year,
           CAST(month(o_orderdate) AS INTEGER)       AS order_month
    FROM orders
    """,
)
def f05_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/date arithmetic + date part extraction (reference:
    utils/ducklake_utils.py:108; exploration/ducklake_analysis.sh:90)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    )


@register(
    "f06_casts",
    survey_ids=("F6",),
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR)        AS key_str,
           CAST(o_totalprice AS BIGINT)       AS price_int,
           CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec,
           CAST(o_orderdate AS DATE)          AS order_date
    FROM orders
    WHERE o_orderkey % 13 = 0
    """,
)
def f06_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family ::VARCHAR ::BIGINT ::DECIMAL ::DATE (reference:
    exploration/ducklake_analysis.sh:88-91).

    Note: double->BIGINT rounds half-to-even in DuckDB (ties: 490342.5 ->
    490342) but truncates in ANSI SQL; Spark matches DuckDB via BROUND
    (banker's rounding) — plain ROUND is HALF_UP and diverges on .5 ties.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return o.select(
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.bround("o_totalprice", 0).cast("bigint").alias("price_int"),
        F.col("o_totalprice").cast(T.DecimalType(12, 2)).alias("price_dec"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@register(
    "f08_json_valid",
    survey_ids=("F8", "A1", "A8"),
    oracle="""
    SELECT json_valid(props) AS is_valid, count(*) AS n_events
    FROM events
    GROUP BY json_valid(props)
    ORDER BY is_valid
    """,
)
def f08_json_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_valid predicate (reference: demos/03_schema_evolution/demo.py:283).

    Spark has no json_valid builtin; `get_json_object` against the root path
    returns NULL exactly when the document fails to parse — same observable
    semantics, still JVM-side.
    """
    e = table(spark, sf_dir, "events").withColumn(
        "is_valid", F.get_json_object("props", "$").isNotNull()
    )
    return (
        e.groupBy("is_valid")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("is_valid")
    )


@register(
    "f09_json_extract",
    survey_ids=("F9",),
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
)
def f09_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_extract_string + typed use in a predicate
    (reference: demos/03_schema_evolution/demo.py:284)."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    )
    return e.filter(F.col("k_num") > 90)


@register(
    "x01_monthly_revenue",
    survey_ids=("A3", "A8", "F5"),  # extension: date_trunc rollup
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           sum(o_totalprice) AS revenue,
           count(*)          AS n_orders
    FROM orders
    GROUP BY 1
    ORDER BY month_start
    """,
)
def x01_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue rollup via date_trunc (extension)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month_start"))
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("month_start")
    )


@register(
    "x02_tumbling_hourly",
    survey_ids=("A3", "A8"),  # extension: tumbling event-time window (§2.11)
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
           count(*)   AS n_events,
           sum(value) AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY bucket_start
    """,
)
def x02_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window over the events table (extension;
    the batch shape of the Structured-Streaming windowed agg in
    ducktales_spark.streaming). Spark window() and DuckDB time_bucket are
    both epoch-aligned."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"), "n_events", "sum_value"
        )
        .orderBy("bucket_start")
    )


@register(
    "f02_random_bounds",
    survey_ids=("F2", "S4", "A10"),
    oracle="SELECT CAST(1 AS BOOLEAN) AS in_range, CAST(1000 AS BIGINT) AS n",
)
def f02_random_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random() data generation (utils/ducklake_utils.py:107). The values are
    non-deterministic by design, so the oracle-checked contract is the
    deterministic envelope: 0 <= rand() < 1 for every generated row."""
    r = spark.range(1000).select(F.rand(seed=42).alias("r"))
    return r.agg(
        ((F.min("r") >= 0) & (F.max("r") < 1)).alias("in_range"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "f03_now_sanity",
    survey_ids=("F3", "F4"),
    oracle="SELECT CAST(1 AS BOOLEAN) AS now_recent, "
    "CAST(1 AS BOOLEAN) AS interval_works",
)
def f03_now_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOW()/CURRENT_TIMESTAMP and interval arithmetic
    (utils/ducklake_utils.py:108). Wall-clock values can't hash-match an
    oracle, so the checked contract is invariants: now() is after 2024 and
    now() - INTERVAL 7 DAYS < now()."""
    return spark.range(1).select(
        (F.year(F.current_timestamp()) >= 2024).alias("now_recent"),
        (
            F.current_timestamp() - F.expr("INTERVAL 7 DAYS")
            < F.current_timestamp()
        ).alias("interval_works"),
    )


@register("s09_functions_introspection", survey_ids=("S9",))
def s09_functions_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_functions()/duckdb_settings() equivalent: SHOW FUNCTIONS +
    spark.conf (exploration/ducklake_analysis.sh:188-191). Rows-only — the
    two engines' registries differ by construction."""
    fns = spark.sql("SHOW FUNCTIONS LIKE 'min*'").orderBy("function")
    return fns
