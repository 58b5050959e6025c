"""Set operations: U1 UNION ALL (SURVEY.md §2.7) + INTERSECT/EXCEPT
extensions, and the S4 range() generator source.

UNION ALL is shuffle-free (concatenated partitions). INTERSECT/EXCEPT lower
to aggregate-distinct + semi/anti join — one shuffle on the full row value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducktales_spark.data import table
from ducktales_spark.registry import register


@register(
    "u01_union_all",
    survey_ids=("U1", "P10"),
    oracle="""
    SELECT 'high' AS tier, o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT 'low' AS tier, o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 5000
    """,
)
def u01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two labeled slices — the reference's snapshot-comparison
    shape (reference: exploration/ducklake_analysis.sh:167-183)."""
    o = table(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 300000).select(
        F.lit("high").alias("tier"), "o_orderkey", "o_totalprice"
    )
    low = o.filter(F.col("o_totalprice") < 5000).select(
        F.lit("low").alias("tier"), "o_orderkey", "o_totalprice"
    )
    return high.unionByName(low)


@register(
    "u02_intersect",
    survey_ids=("U1",),  # extension: INTERSECT (distinct)
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def u02_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both finished and open orders (extension)."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@register(
    "u03_except",
    survey_ids=("U1",),  # extension: EXCEPT (distinct)
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT CAST(o_custkey AS BIGINT) FROM orders
    """,
)
def u03_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer keys that never ordered (extension)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("bigint").alias("c_custkey")
    )
    return c.subtract(o)


@register(
    "s04_range_generator",
    survey_ids=("S4", "P2", "F5", "F6"),
    oracle="""
    SELECT CAST(range AS BIGINT)                      AS id,
           CAST(range % 10 AS BIGINT)                 AS bucket,
           DATE '2024-01-01' + CAST(range % 365 AS INTEGER) AS d
    FROM range(0, 1000)
    """,
)
def s04_range_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range(n) synthetic generator with derived columns — the reference's
    data-gen pattern (reference: utils/ducklake_utils.py:109,
    exploration/benchmark_ducklake.sh:76). spark.range parallelizes the
    sequence across partitions (no driver materialization)."""
    return spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("bucket"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 365).cast("int")).alias("d"),
    )
