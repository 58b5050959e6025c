"""Aggregation operators A1-A10 (SURVEY.md §2.4) + grouping-set extensions.

All are single hash-aggregation plans: partial aggregation map-side, one
shuffle keyed on the group-by columns, final aggregation. Cardinality of the
shuffle is the number of groups, not input rows — scale-stable.
COUNT(DISTINCT) rewrites to a two-phase expand+aggregate in Catalyst; exact
per the reference (A2), with approx_count_distinct available where a sketch
is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducktales_spark.data import plan_memo, table
from ducktales_spark.registry import register, register_extra


@register_extra(
    # rotated to EXTRA in round 14: the driver sweep is capped at 50, and
    # l21_optimize_zorder (the round-13 headline maintenance verb) needed a
    # CORRECTNESS slot. A2 stays driver-swept via r02_rollup_count_distinct,
    # whose MV tier maintains COUNT(DISTINCT) incrementally; this full
    # differential still runs in pytest.
    "a02_count_distinct",
    survey_ids=("A2", "A8"),
    oracle="""
    SELECT c_mktsegment,
           count(DISTINCT c_nationkey) AS n_nations,
           count(*)                    AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def a02_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (reference: demos/05_catalog_portability/demo.py:361)."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "a06_conditional_agg",
    survey_ids=("A4", "A6", "A8"),
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_finished,
           avg(o_totalprice) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def a06_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(CASE WHEN ...) conditional aggregate (reference: demos/05_catalog_portability/demo.py:348)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("n_finished"),
            F.avg("o_totalprice").alias("avg_price"),
        )
    )


@register(
    "a09_groupby_multikey",
    survey_ids=("A3", "A8", "A9"),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           sum(l_quantity) AS sum_qty,
           count(*)        AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INTEGER)
    ORDER BY l_returnflag, l_linestatus, ship_year
    """,
)
@plan_memo
def a09_groupby_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key GROUP BY incl. computed key (reference: demos/05_catalog_portability/demo.py:162).

    The residual sf10 gap vs the single-node twin is the SCAN, not the
    aggregation (r12 decomposition, interleaved min-of-7 at 60 M rows):
    the full query runs 0.80 s and a decode-only max() over its four read
    columns runs 0.82 s — the two-phase hash agg adds nothing measurable.
    Per-column probes place the cost in the two 1-char STRING group keys
    (max(l_returnflag) alone 0.50 s vs 0.15 s count-only floor, ~0.35 s
    per string column = ~6 ns/row of JVM UTF8String materialization;
    l_shipdate +0.04 s, l_quantity +0.02 s). The DuckDB twin reads the
    same columns dictionary-aware in 0.24 s. There is no plan lever in
    our layer: partial aggregation already reduces 60 M rows to 42 x
    n_tasks before the exchange (~KB shuffled, so partition count is
    irrelevant), and the group keys must be decoded to be grouped. The
    constant is flat in SF, amortizes across executors at cluster scale,
    and the compute-heavy queries over the SAME scan (t02/d02/d03 at
    0.02-0.18x the twin) bound what it can cost at 100 TB."""
    li = table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus", "ship_year")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
    )


@register_extra(
    # rotated to the EXTRA tier in round 7 (A1/A3/A5 stay driver-covered by
    # q1/d01/x06 among others, A10 by f02) to free a driver slot for
    # c05_decontaminate_fuzzy; the DuckDB differential still runs in pytest
    "a10_global_agg",
    survey_ids=("A1", "A3", "A5", "A10"),
    oracle="""
    SELECT count(*)             AS n_rows,
           sum(l_extendedprice) AS total_price,
           min(l_quantity)      AS min_qty,
           max(l_quantity)      AS max_qty,
           avg(l_discount)      AS avg_disc
    FROM lineitem
    """,
)
def a10_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregate (reference: demos/05_catalog_portability/demo.py:357-366)."""
    return table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_extendedprice").alias("total_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.avg("l_discount").alias("avg_disc"),
    )


@register_extra(
    # rotated to the EXTRA tier in round 5 (A8 stays driver-covered by
    # a06/a09/q1 among others) to free a driver slot for r01_rollup_refresh;
    # the full DuckDB differential still runs in pytest
    "x05_cube",
    survey_ids=("A8",),  # extension beyond reference (Spark/DuckDB CUBE;
    # the CUBE grouping sets are a superset of ROLLUP's, so this one query
    # covers the grouping-set family)
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           sum(l_quantity)          AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def x05_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over flag/status (extension)."""
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
    )


@register_extra(
    "x08_pivot",
    survey_ids=("A6", "A8"),  # extension: PIVOT (DuckDB's PIVOT verb) —
    # semantically conditional aggregation per pivoted value, which is how
    # the oracle spells it
    oracle="""
    SELECT o_orderpriority,
           sum(o_totalprice) FILTER (o_orderstatus = 'F') AS total_F,
           sum(o_totalprice) FILTER (o_orderstatus = 'O') AS total_O,
           sum(o_totalprice) FILTER (o_orderstatus = 'P') AS total_P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def x08_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order value by priority, one column per order status. The
    pivoted value list is EXPLICIT (['F','O','P']) — with an explicit list
    Spark plans a single conditional-aggregation pass (one shuffle on the
    remaining group key, exactly the a06 shape); omitting it triggers a
    driver-side distinct-values job first, which at 100 TB is a full extra
    scan and an unbounded-width schema. Same restriction DuckDB's PIVOT
    applies via its IN clause."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
        .select(
            "o_orderpriority",
            F.col("F").alias("total_F"),
            F.col("O").alias("total_O"),
            F.col("P").alias("total_P"),
        )
    )


@register_extra(
    "x09_grouping_sets",
    survey_ids=("A8",),  # extension: explicit GROUPING SETS — the general
    # form CUBE/ROLLUP compile into; this set {(flag),(status)} is NOT a
    # cube or rollup of anything, so it exercises the API directly
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           sum(l_quantity)          AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def x09_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS {(l_returnflag), (l_linestatus)}: per-flag and
    per-status totals in ONE pass over lineitem (Catalyst Expand + a single
    hash aggregation — one scan + one shuffle instead of a UNION ALL of two
    aggregations, which would scan twice at 100 TB)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
    )
