"""Flagship query: TPC-H-Q1-style pricing summary over lineitem.

Mirrors the reference's region-summary aggregation pattern
(reference: exploration/ducklake_analysis.sh:109-117) on the driver's
lineitem table. Exercises S2/S3 scan, A1/A3/A4/A8 aggregates, O1 sort.

Scale notes: a single hash aggregation with partial (map-side) combine —
Catalyst emits HashAggregate(partial) -> Exchange(4 groups) ->
HashAggregate(final). The shuffle moves only |groups| x |cols| rows, so this
plan is flat at 100 TB; the scan dominates and both the shipdate filter and
the 7-column projection push into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducktales_spark.data import plan_memo, table
from ducktales_spark.registry import register

_CUTOFF = "1998-09-02 00:00:00"


@register(
    "q1_pricing_summary",
    survey_ids=("S2", "S3", "A1", "A3", "A4", "A8", "O1"),
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                       AS sum_qty,
           sum(l_extendedprice)                                  AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity)                                       AS avg_qty,
           avg(l_extendedprice)                                  AS avg_price,
           avg(l_discount)                                       AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
@plan_memo
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: grouped sums/averages with a date filter.

    sf10 ratio decomposition (r13, paired interleaved min-of-7, same
    machine): full q1 measured 0.388-0.486 s across probes vs DuckDB twin
    0.187-0.246 s (~2.0-2.6x). The probe ladder pins where the delta
    lives: the same scan + filter + all EIGHT aggregates with NO group
    keys runs 0.142 s (decode-only 0.129 s, bare scan 0.116 s) — i.e.
    the whole gap is the grouped-aggregation hash-map probe that a
    global aggregate skips (flat buffers), ~4 ns/row over 59 M rows.
    Two A/Bs confirm it is the per-row map lookup, not key width: an
    ascii-packed INT group key measured 0.38 s (no win) and the
    vectorized first-level agg map 0.458 s (worse). The constant is flat
    in SF and splits across executors — the same accepted decomposition
    as a09 (aggregations.py), bounded by the compute-heavy queries on
    this corpus running 16-40x FASTER than the twin at sf10 (d03 8.8 s
    vs a 159-398 s twin band across rounds; the committed r13 artifact
    pairs 8.8 s vs 172 s = 20x)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
