"""Join operators J1-J3 (SURVEY.md §2.3) plus semi/anti/self-join extensions.

Scale strategy: region/nation are bounded dims -> explicit broadcast (no
shuffle of the fact side). customer-orders joins shuffle on the key; at
100 TB both sides hash-partition on the join key and AQE handles skew
(skewJoin enabled in session config). No cartesian products anywhere.
"""

from __future__ import annotations

import os

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducktales_spark.data import plan_memo, table
from ducktales_spark.registry import register, register_extra


@register(
    "j01_inner_join_revenue_by_region",
    survey_ids=("J1", "A3", "A8"),
    oracle="""
    SELECT r_name AS region_name,
           sum(o_totalprice) AS revenue,
           count(*)          AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY region_name
    """,
)
@plan_memo
def j01_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain fact->dims (reference: demos/02_time_travel/demo.py:288).

    orders⋈customer picks its strategy from table stats (file size, the
    same signal a CBO uses): under ~8 MB Spark's auto-broadcast wins; above
    it we hint shuffle_hash — the downstream hash-agg gains nothing from
    SMJ's sort order, and rebuilding a multi-million-row broadcast per
    query costs more than hash-partitioning both sides (measured sf10,
    interleaved min-of-7: broadcast 1.05 s vs shuffle_hash 0.94 s). At
    100 TB customer scales with the fact table and broadcast is not an
    option at all. nation/region are geography-bounded -> always broadcast.

    The residual sf10 gap vs the single-node twin is the 1.5 M-row hash
    TABLE BUILD, not plan shape (r11 decomposition, min-of-6 each: orders
    scan+agg 0.12 s; probing all 17.5 M rows against a tiny build 0.25 s;
    the same join with the full customer build 0.84 s, of which a
    build-only variant — one-row probe side — is 0.80 s). Every
    alternative measured worse: shuffle_hash 0.92 s, aggregate-before-join
    1.64 s. The build cost is the JVM HashedRelation constant both
    strategies share; DuckDB's vectorized multithreaded build is simply
    faster at this cardinality, while the probe side — the part that
    scales with the fact table — is already competitive.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    try:
        big_build = os.path.getsize(
            os.path.join(sf_dir, "customer.parquet")
        ) > (8 << 20)
    except OSError:
        # non-local / directory-backed layout: no driver-side stat available;
        # leave the build side un-hinted and let Spark's auto-broadcast
        # threshold (or AQE on a real cluster) pick the strategy
        big_build = False
    if big_build:
        c = c.hint("shuffle_hash")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "j02_left_join_coalesce",
    survey_ids=("J2", "A3", "A7", "A8"),
    oracle="""
    SELECT c_custkey,
           COALESCE(sum(o_totalprice), 0)                        AS total_spent,
           CAST(count(o_orderkey) AS BIGINT)                     AS n_orders
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
@plan_memo
def j02_left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN + COALESCE(SUM,0) — the reference's product_inventory view
    (reference: demos/05_catalog_portability/demo.py:150-164)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
            F.count("o_orderkey").alias("n_orders"),
        )
    )


@register_extra(
    # rotated to EXTRA in round 6: J1/J2 are redundantly covered by
    # j01/j02's driver rows (semi/anti is an extension); the differential
    # still runs in pytest — the slot went to t06_corpus_report.
    "j03_semi_anti",
    survey_ids=("J1", "J2"),  # extension: Spark-native left_semi/left_anti
    oracle="""
    SELECT 'has_big_order' AS kind, c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    UNION ALL
    SELECT 'no_orders' AS kind, c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j03_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS: customers having a >300k order) + left-anti
    join (NOT EXISTS: customers with no orders), as labeled slices."""
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    o = table(spark, sf_dir, "orders")
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        F.lit("has_big_order").alias("kind"), "c_custkey", "c_name"
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("no_orders").alias("kind"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


@register_extra(
    "j05_self_join",
    survey_ids=("J3",),
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
    FROM nation a
    JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    ORDER BY nation_a, nation_b
    """,
)
def j05_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join producing same-region nation pairs — the structural shape of
    the reference's cross-version diff self-join (reference:
    demos/02_time_travel/demo.py:271-291; the true versioned variant lives in
    the lake layer as table_changes)."""
    a = table(spark, sf_dir, "nation").alias("a")
    b = table(spark, sf_dir, "nation").alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
            F.col("a.n_regionkey").alias("regionkey"),
        )
    )


@register(
    "j06_asof_join",
    survey_ids=(),  # extension: as-of (nearest-prior-event) join
    oracle="""
    SELECT c.event_id AS click_id,
           c.user_id  AS user_id,
           e.event_id AS prior_error_id,
           CAST(date_diff('microsecond', e.ts, c.ts) AS BIGINT)
               AS micros_since_error
    FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts
          FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT event_id, user_id, ts::TIMESTAMP AS ts
                    FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    ORDER BY click_id
    """,
)
def j06_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event matched to the user's most recent error
    at or before it (DuckDB expresses this natively as ASOF LEFT JOIN —
    the oracle). Spark has no asof primitive, so this uses the canonical
    distributed formulation: union both event kinds with a marker, ONE
    shuffle on user_id, and a running last_value(ignorenulls) window ordered
    by time — cost is sort + single pass, never the range-join pair
    explosion, and it scales to arbitrarily many rows per key. Errors sort
    before clicks at equal timestamps so 'at or before' includes ties."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.col("event_id").alias("err_id"),
        F.lit(None).cast("bigint").alias("click_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("err_id"),
        F.col("event_id").alias("click_id"),
    )
    u = errors.unionByName(clicks)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("err_id").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prior = F.last(
        F.when(
            F.col("err_id").isNotNull(),
            F.struct(F.col("err_id"), F.col("ts").alias("err_ts")),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        u.withColumn("prior", prior)
        .filter(F.col("click_id").isNotNull())
        .select(
            F.col("click_id"),
            F.col("user_id"),
            F.col("prior.err_id").alias("prior_error_id"),
            # timestampdiff works for both TIMESTAMP and TIMESTAMP_NTZ (the
            # driver's events.ts has shipped as both nanos-as-long and
            # micros-NTZ across data generations); unix_micros would reject NTZ
            F.expr(
                "timestampdiff(MICROSECOND, prior.err_ts, ts)"
            ).alias("micros_since_error"),
        )
    )


def _epoch_micros(name: str):
    """Microseconds since epoch for a TIMESTAMP or TIMESTAMP_NTZ column.
    unix_micros rejects NTZ; timestampdiff over two TIMESTAMPs accepts both
    once the column is cast (identity for TIMESTAMP; NTZ reinterprets the
    wall time in the session zone, UTC everywhere in this repo)."""
    return F.expr(
        "timestampdiff(MICROSECOND, timestamp'1970-01-01 00:00:00', "
        f"cast({name} as timestamp))"
    )


# (plan semanticHash, start_col, end_col) -> derived seconds. Memoizing on
# the semantic hash is safe because granularity affects only the plan's
# replication factor, never the join's RESULT — a hash collision costs a
# suboptimal width, not a wrong answer.
_GRANULARITY_CACHE: dict = {}


def derived_granularity(
    intervals: DataFrame, start_col: str, end_col: str
) -> int:
    """Bucket width (seconds) sized to the intervals themselves: their p95
    length, from ONE column-pruned aggregation (the scan reads only the two
    timestamp columns). At that width ~95% of intervals replicate to at
    most 2 buckets, and only tail outliers replicate further (bounded by
    length/p95) — the same measure-the-input policy corpus.shards_for
    applies to shard counts. Falls back to 600 s when the interval side is
    empty or degenerate.

    EAGER: runs one Spark job (`.first()`) at call time, so the default-
    granularity ``interval_join`` is not fully lazy, and STREAMING interval
    frames cannot take it (aggregating a stream without an output sink
    raises AnalysisException) — pass an explicit ``granularity_s`` on
    streaming or latency-critical paths. Repeated calls over the same
    interval lineage are memoized per (plan, cols), so N joins over one
    interval table pay the p95 job once."""
    try:
        key = (intervals.semanticHash(), start_col, end_col)
    except Exception:  # streaming/exotic plans: fall through, uncached
        key = None
    if key is not None and key in _GRANULARITY_CACHE:
        return _GRANULARITY_CACHE[key]
    s_us = _epoch_micros(start_col)
    e_us = _epoch_micros(end_col)
    row = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .select(
            F.percentile_approx(
                e_us - s_us, F.lit(0.95), F.lit(10_000)
            ).alias("p95_us")
        )
        .first()
    )
    if row is None or row["p95_us"] is None or row["p95_us"] <= 0:
        g = 600
    else:
        g = max(1, -(-int(row["p95_us"]) // 1_000_000))
    if key is not None:
        if len(_GRANULARITY_CACHE) >= 256:  # bound driver memory
            _GRANULARITY_CACHE.clear()
        _GRANULARITY_CACHE[key] = g
    return g


def _bucketed_intervals(
    intervals: DataFrame, start_col: str, end_col: str, g_us: int
) -> DataFrame:
    """Intervals exploded to the ``g_us``-wide buckets they overlap (empty
    and inverted intervals dropped — half-open semantics)."""
    s_us = _epoch_micros(start_col)
    e_us = _epoch_micros(end_col)
    return intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(F.floor(s_us / g_us), F.floor((e_us - 1) / g_us))
        ),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: tuple = (),
    granularity_s: Optional[int] = None,
) -> DataFrame:
    """Range join: each point row matched to every interval row with
    ``start <= point_ts < end`` (and equal ``keys``), as a bucketed
    EQUI-join — the scalable formulation of an operator Spark has no
    primitive for (the reference engine family expresses it as an
    inequality join; DuckDB plans an IEJoin, ``SELECT ... FROM points p
    JOIN iv ON p.ts >= iv.s AND p.ts < iv.e``).

    A naive translation is a cross join + filter — quadratic, dead at any
    scale. Here time is cut into fixed buckets of ``granularity_s``:
    intervals explode to the buckets they overlap, points map to exactly
    ONE bucket, and the join key is (bucket, *keys) — shuffle volume is
    |points| + |intervals| * avg_buckets_per_interval, never |points| x
    |intervals|. Each qualifying pair meets in exactly one bucket (the
    point's), so no post-join dedup is needed.

    ``granularity_s=None`` (the default) DERIVES the bucket width from the
    intervals' p95 length (derived_granularity — one cheap column-pruned
    agg, EAGER at plan time and memoized per interval lineage; pass an
    explicit value for streaming interval frames, which cannot run the
    derivation): a caller-guessed width much finer than the intervals replicates
    every interval to many buckets (a 12 h window over 600 s buckets is 72
    replicas), while the derived width bounds typical replication at 2.
    Pass an explicit value to trade replication against post-join
    filtering by hand. Long outlier intervals only add replicated interval
    rows (bounded by length/granularity); a hot bucket is an AQE skew-join
    case, not a correctness one.
    """
    if granularity_s is None:
        granularity_s = derived_granularity(intervals, start_col, end_col)
    g_us = granularity_s * 1_000_000
    p = points.withColumn(
        "__bucket", F.floor(_epoch_micros(point_ts) / g_us)
    )
    iv = _bucketed_intervals(intervals, start_col, end_col, g_us)
    cond = [p["__bucket"] == iv["__bucket"]]
    cond += [p[k] == iv[k] for k in keys]
    cond += [
        p[point_ts] >= iv[start_col],
        p[point_ts] < iv[end_col],
    ]
    from functools import reduce as _reduce
    import operator as _op

    joined = p.join(iv, _reduce(_op.and_, cond))
    drop = [iv[k] for k in keys] + [p["__bucket"], iv["__bucket"]]
    for c in drop:
        joined = joined.drop(c)
    return joined


@register(
    "i01_interval_join",
    survey_ids=("P4", "J1"),  # extension: range join, the scalable form of
    # the reference family's inequality-predicate scans
    # (exploration/ducklake_analysis.sh:124,144); DuckDB plans it as IEJoin
    oracle="""
    SELECT c.event_id, e.event_id AS iv_id
    FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts
          FROM events WHERE event_type = 'click') c
    JOIN (SELECT event_id, user_id, ts::TIMESTAMP AS start_ts,
                 ts::TIMESTAMP + INTERVAL 12 HOUR AS end_ts
          FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND c.ts >= e.start_ts AND c.ts < e.end_ts
    ORDER BY c.event_id, iv_id
    """,
)
def i01_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: every click matched to each same-user error
    window [error_ts, error_ts + 12 h). DuckDB's planner expresses the
    inequality pair natively as an IEJoin; Spark has no range-join
    primitive, so interval_join buckets time and joins on (bucket, user) —
    an EQUI-join whose shuffle volume is |points| + replicated intervals,
    never the |points| x |intervals| of a cross-join + filter (the no-
    cartesian property is plan-asserted in tests/test_interval_join.py)."""
    ev = table(spark, sf_dir, "events")
    points = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("iv_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 12 HOURS")).alias("end_ts"),
    )
    return interval_join(
        points, intervals, "ts", "start_ts", "end_ts", keys=("user_id",),
        granularity_s=3600,
    ).select("event_id", "iv_id")
