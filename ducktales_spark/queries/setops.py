"""Set operations: U1 UNION ALL (SURVEY.md §2.7) + INTERSECT/EXCEPT
extensions, and the S4 range() generator source.

UNION ALL is shuffle-free (concatenated partitions). INTERSECT/EXCEPT lower
to aggregate-distinct + semi/anti join — one shuffle on the full row value.
Consolidated to one labeled-slice query (driver budget; see projections.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducktales_spark.data import table
from ducktales_spark.registry import register_extra


@register_extra(  # rotated to EXTRA in round 13: U1 rides
    # l20_attached_migration's UNION ALL read-back (and P4 rides
    # p03/i01/l18), freeing the driver slot for the r12 attach surface;
    # the full DuckDB differential stays in pytest
    "u01_setops",
    survey_ids=("U1", "P4"),
    oracle="""
    SELECT 'high' AS kind, o_orderkey AS set_key
    FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT 'low' AS kind, o_orderkey AS set_key
    FROM orders WHERE o_totalprice < 5000
    UNION ALL
    SELECT 'both_status' AS kind, set_key FROM (
        SELECT o_custkey AS set_key FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'never_ordered' AS kind, set_key FROM (
        SELECT c_custkey AS set_key FROM customer
        EXCEPT
        SELECT CAST(o_custkey AS BIGINT) FROM orders
    )
    """,
)
def u01_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of labeled slices (U1, the reference's snapshot-comparison
    shape, exploration/ducklake_analysis.sh:167-183) + INTERSECT (customers
    with both finished and open orders) + EXCEPT (customers that never
    ordered), all as (kind, set_key) rows."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    high = o.filter(F.col("o_totalprice") > 300000).select(
        F.lit("high").alias("kind"), F.col("o_orderkey").alias("set_key")
    )
    low = o.filter(F.col("o_totalprice") < 5000).select(
        F.lit("low").alias("kind"), F.col("o_orderkey").alias("set_key")
    )
    both = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("set_key"))
        .intersect(
            o.filter(F.col("o_orderstatus") == "O").select(
                F.col("o_custkey").alias("set_key")
            )
        )
        .select(F.lit("both_status").alias("kind"), "set_key")
    )
    never = (
        c.select(F.col("c_custkey").alias("set_key"))
        .subtract(o.select(F.col("o_custkey").cast("bigint").alias("set_key")))
        .select(F.lit("never_ordered").alias("kind"), "set_key")
    )
    return high.unionByName(low).unionByName(both).unionByName(never)


# (the former s04_range_generator entry lives on inside f02_gen_invariants —
# see queries/functions.py — keeping the registry at the driver's 50-query
# sweep size after x07_streaming_sessionize joined it)
