"""Projection / filter / predicate operators P1-P11 (SURVEY.md §2.2).

Every filter here compiles to a parquet-pushed predicate (check:
`PushedFilters` in .explain("formatted")) and every projection prunes the
read schema — these are scan-dominated plans with zero shuffles, the ideal
shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducktales_spark.data import table
from ducktales_spark.registry import register


@register(
    "p01_projection_alias",
    survey_ids=("P1",),
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name, c_mktsegment AS segment
    FROM customer
    """,
)
def p01_projection_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection with aliases (reference: demos/02_time_travel/demo.py:184)."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "p02_expr_concat",
    survey_ids=("P2", "F1", "F10"),
    oracle="""
    SELECT o_orderkey,
           o_orderpriority || '/' || o_orderstatus AS tag,
           o_totalprice * 1.15                     AS uplifted
    FROM orders
    """,
)
def p02_expr_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression projection: `||` concat + arithmetic (reference: utils/ducklake_utils.py:106-107)."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat(
            F.col("o_orderpriority"), F.lit("/"), F.col("o_orderstatus")
        ).alias("tag"),
        (F.col("o_totalprice") * 1.15).alias("uplifted"),
    )


@register(
    "p03_filter_eq",
    survey_ids=("P3",),
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus != 'O'
    """,
)
def p03_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality / inequality filters (reference: demos/01_transaction_rollback/demo.py:101)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") != "O")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "p04_range_pred",
    survey_ids=("P4",),
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice >= 100000 AND o_totalprice < 200000
    """,
)
def p04_range_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates < >= (reference: exploration/ducklake_analysis.sh:124,144)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_totalprice") >= 100000) & (F.col("o_totalprice") < 200000)
    ).select("o_orderkey", "o_totalprice")


@register(
    "p05_like",
    survey_ids=("P5",),
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%BRASS%' OR p_name LIKE 'a%'
    """,
)
def p05_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE patterns (reference: demos/03_schema_evolution/demo.py:150-151)."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%BRASS%") | F.col("p_name").like("a%")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "p06_in_list",
    survey_ids=("P6",),
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    """,
)
def p06_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN literal list (reference: demos/01_transaction_rollback/demo.py:168)."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "p07_compound_bool",
    survey_ids=("P7",),
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE (l_quantity < 5 OR l_quantity > 45) AND l_discount > 0.05
    """,
)
def p07_compound_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR predicate (reference: exploration/ducklake_analysis.sh:124,145)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") < 5) | (F.col("l_quantity") > 45))
        & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "p08_null_check",
    survey_ids=("P8", "F7"),
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NULL
    """,
)
def p08_null_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL predicate + COALESCE fill (reference: demos/03_schema_evolution/demo.py:188,215)."""
    o = table(spark, sf_dir, "orders").withColumn(
        "status_or_null", F.nullif(F.col("o_orderstatus"), F.lit("O"))
    )
    return o.filter(F.col("status_or_null").isNull()).select(
        "o_orderkey",
        "status_or_null",
        F.coalesce(F.col("status_or_null"), F.lit("OPEN")).alias("status_label"),
    )


@register(
    "p09_modulo",
    survey_ids=("P9", "F11"),
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def p09_modulo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modulo predicate id % k = 0 (reference: exploration/benchmark_ducklake.sh:127)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey", "o_totalprice")


@register(
    "p10_case_when",
    survey_ids=("P10", "A1", "A8"),
    oracle="""
    SELECT CASE WHEN o_totalprice > 250000 THEN 'large'
                WHEN o_totalprice > 100000 THEN 'medium'
                ELSE 'small' END AS size_bucket,
           count(*)          AS n_orders,
           sum(o_totalprice) AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY size_bucket
    """,
)
def p10_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched CASE WHEN, incl. nested in agg (reference: exploration/ducklake_analysis.sh:92-97)."""
    o = table(spark, sf_dir, "orders").withColumn(
        "size_bucket",
        F.when(F.col("o_totalprice") > 250000, "large")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small"),
    )
    return (
        o.groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
        .orderBy("size_bucket")
    )


@register(
    "p11_scalar_subquery",
    survey_ids=("P11", "A4"),
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def p11_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (reference: demos/03_schema_evolution/demo.py:45-47).

    Expressed in Spark SQL — Catalyst plans the scalar subquery as a
    broadcast-able single-row subplan, no driver round-trip.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        """
    )
