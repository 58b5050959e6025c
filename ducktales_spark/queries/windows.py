"""Window operators: W1 (SURVEY.md §2.5) + ranking/analytic extensions,
sort/limit operators O1-O4 (§2.6), and the event-time window family
(the batch shape of the Structured-Streaming operators in
ducktales_spark.streaming).

Scale notes: every window here is PARTITIONED (partitionBy) so state is
bounded per key and the plan is one shuffle on the partition key + in-
partition sort. The reference's empty-OVER row_number (W1) is inherently a
single-partition global sort — we keep it deterministic by ordering on a
unique key, and bound the output with LIMIT so the global sort lowers to
TakeOrderedAndProject (top-k per partition + driver merge, no single-node
full sort) — the only scale-safe shape for a global sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ducktales_spark.data import plan_memo, table
from ducktales_spark.registry import register, register_extra


@register_extra(
    "w01_row_number_global",
    survey_ids=("W1", "O2", "O4"),
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
               AS seq,
           o_orderkey, o_totalprice
    FROM orders
    ORDER BY seq
    LIMIT 25
    """,
)
def w01_row_number_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row_number sequence (reference: exploration/ducklake_analysis.sh:87).

    Deterministic total order (price desc, unique key tiebreak); LIMIT keeps
    the global window top-k-shaped.
    """
    o = table(spark, sf_dir, "orders")
    w = W.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            F.row_number().over(w).cast("bigint").alias("seq"),
            "o_orderkey",
            "o_totalprice",
        )
        .orderBy("seq")
        .limit(25)
    )


@register(
    "w02_topk_per_group",
    survey_ids=("W1",),  # extension: partitioned ranking
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
)
@plan_memo
def w02_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k rows per group via partitioned row_number (extension).

    Catalyst inserts a WindowGroupLimit (rank-limit pushdown) so each
    partition keeps only k rows before the final filter — scale-stable.

    The residual sf10 gap vs the twin is the PARTIAL WindowGroupLimit
    phase's per-row constant, not shuffle or plan shape (r12
    decomposition, interleaved min-of-7 at 1.5 M customer rows): full
    query 0.59 s, decode-only max() over its three read columns 0.18 s —
    the remaining ~0.42 s is the map-side per-group top-3 maintenance
    over every input row. The plan is already optimal: the Partial limit
    emits ~15 rows per map task, so the exchange and the Final
    window are trivial (plan-asserted in tests/test_plans.py); there is
    no pre-aggregation that preserves per-row rank semantics. The
    constant is flat in SF and splits across executors at cluster
    scale."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register_extra(
    "w03_analytic",
    survey_ids=("W1",),  # extension: analytic frame + lag in one window
    oracle="""
    SELECT user_id, event_id, value,
           sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS delta
    FROM events
    WHERE user_id % 50 = 0
    ORDER BY user_id, event_id
    """,
)
def w03_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum (frame spec) + lag delta over event time — both
    analytic functions share ONE window partition/sort, so the plan has a
    single shuffle + sort (extension)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.sum("value")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("running_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "o01_sort_limit_topk",
    survey_ids=("O1", "O2", "O3", "O4"),
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
@plan_memo
def o01_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column ORDER BY ... DESC LIMIT n -> TakeOrderedAndProject
    (reference: demos/02_time_travel/demo.py:132-137,
    exploration/ducklake_analysis.sh:183). Covers ORDER BY (O1), DESC (O2),
    multi-column sort (O3) and LIMIT top-k (O4) in one plan.

    The sf10 residual vs the twin is the scan itself (r12 decomposition,
    interleaved min-of-7 at 15 M orders rows): full query 0.167 s,
    decode-only max() over the three projected columns 0.137 s — the
    per-task top-10 heap plus the single-row driver merge add 0.03 s.
    The query IS its scan at this width; the twin's 0.034 s is DuckDB's
    faster column decode of the same bytes, an engine constant that is
    flat in SF and splits across executors at cluster scale."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


@register(
    "x02_event_windows",
    survey_ids=("A1", "A3", "A8"),  # extension: tumbling + sliding windows
    oracle="""
    WITH tumb AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, value
        FROM events
    ),
    slide AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS win_start, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
               value
        FROM events
    )
    SELECT 'tumbling' AS kind, win_start,
           win_start + INTERVAL '1 hour' AS win_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM tumb GROUP BY win_start
    UNION ALL
    SELECT 'sliding' AS kind, win_start,
           win_start + INTERVAL '1 hour' AS win_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM slide GROUP BY win_start
    ORDER BY kind, win_start
    """,
)
@plan_memo
def x02_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1h) + sliding (1h / 30min) event-time windows over the
    events table — the batch shape of the Structured-Streaming windowed aggs
    in ducktales_spark.streaming. Spark window() and DuckDB time_bucket are
    both epoch-aligned; in the sliding case each event lands in exactly two
    windows (the oracle materializes both memberships via UNION ALL).

    ONE aggregation, ONE shuffle, LONG group keys: each event computes its
    30-minute half-bucket index (epoch arithmetic — a codegen long
    expression), explodes into the two sliding windows that contain it
    (start buckets hb and hb-1), and a single groupBy(wb) aggregates both
    kinds at once (hour-aligned starts — even wb — ARE the tumbling
    windows, so they emit both kind labels from O(#windows) aggregated
    rows). vs groupBy(window(...)): same shuffle count, but the group key
    is a long instead of a struct<timestamp,timestamp> and no per-row
    window-struct construction. vs a two-level rollup (agg per half-bucket,
    then combine adjacent buckets): the second shuffle's fixed stage cost
    exceeds what halving the partial-agg input saves at every measured SF
    (interleaved sf10-equivalent A/B: two-level 0.50 s, this 0.31 s) — the
    partial agg collapses each task's rows to O(#buckets) before the
    exchange either way, so the shuffle is O(#windows), flat in SF.

    Remaining gap vs the DuckDB twin at sf10 (r12: 0.52-0.59 s vs a twin
    band of 0.09-0.16 s — the twin itself measured 1.25 s in r11 on the
    same data, so treat single twin samples skeptically) is the per-row
    JVM hash-aggregate constant, not plan shape: the same scan's decode
    floor is 0.13 s and ONE tumbling-window aggregate over the same rows
    already costs 0.30 s (r12 interleaved min-of-7) — this query does the
    tumbling + two-bucket sliding work in 0.59 s, i.e. sublinear in the
    three aggregate memberships, exactly what the single-shuffle
    epoch-bucket plan is for."""
    from pyspark.sql.types import TimestampNTZType

    e = table(spark, sf_dir, "events").select("ts", "value")
    # events.ts has shipped as both TIMESTAMP and TIMESTAMP_NTZ across data
    # generations — build the epoch arithmetic against a literal of the
    # matching type so neither cast is an analysis error.
    ntz = isinstance(e.schema["ts"].dataType, TimestampNTZType)
    epoch = (
        "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
        if ntz
        else "timestamp_seconds(0)"
    )
    hb = F.expr(f"timestampdiff(SECOND, {epoch}, ts) div 1800")
    win = (
        e.select(
            F.explode(F.array(hb, hb - 1)).alias("wb"),
            "value",
        )
        .groupBy("wb")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    win_start = F.expr(f"timestampadd(SECOND, wb * 1800, {epoch})")
    win_end = F.expr(f"timestampadd(SECOND, wb * 1800 + 3600, {epoch})")
    return win.select(
        F.explode(
            # epoch second 0 is hour-aligned, so even wb <=> minute == 0
            F.when(
                F.col("wb") % 2 == 0,
                F.array(F.lit("tumbling"), F.lit("sliding")),
            ).otherwise(F.array(F.lit("sliding")))
        ).alias("kind"),
        win_start.alias("win_start"),
        win_end.alias("win_end"),
        "n_events",
        "sum_value",
    )


@register_extra(
    # rotated to the EXTRA tier in round 8 (full DuckDB differential stays in
    # tests/test_oracle_parity.py): its ids are redundantly driver-covered
    # (W1 x3, A8 x12, A5 x2) and the freed slot promotes the c07 both-mode
    # decontamination differential into the driver sweep
    "x06_sessionize_batch",
    survey_ids=("W1", "A8", "A5"),  # extension: relational sessionization
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
)
def x06_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational sessionization (30-min inactivity gap): lag -> new-session
    flag -> running sum -> per-session agg. The batch twin of the stateful
    streaming sessionizer (ducktales_spark.streaming.sessionize); one shuffle
    on user_id serves both window functions AND the final aggregation."""
    e = table(spark, sf_dir, "events").select("user_id", "ts")
    w = W.partitionBy("user_id").orderBy("ts")
    # timestampdiff works for both TIMESTAMP and TIMESTAMP_NTZ (the driver's
    # events.ts has shipped as both across data generations); casting NTZ to
    # BIGINT is a DATATYPE_MISMATCH analysis error.
    flagged = e.select(
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("lag_ts"),
    ).select(
        "user_id",
        "ts",
        F.when(
            F.col("lag_ts").isNull()
            # MICROSECOND so sub-second gap fractions compare exactly like
            # the oracle's `ts - lag(ts) > INTERVAL '30 minutes'`
            | (
                F.expr("timestampdiff(MICROSECOND, lag_ts, ts)")
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("session_no"),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "x07_streaming_sessionize",
    survey_ids=(),  # extension: the REAL stateful streaming operator under
    # an external signal — not a batch twin; the driver's oracle checks the
    # applyInPandasWithState output itself
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_no,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(count(*) AS INT) AS n_events
        FROM numbered
        GROUP BY user_id, session_no
    )
    SELECT user_id, session_start, session_end, n_events
    FROM sessions
    QUALIFY session_no < max(session_no) OVER (PARTITION BY user_id)
    ORDER BY user_id, session_start
    """,
)
def x07_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the ACTUAL Structured-Streaming stateful sessionizer
    (applyInPandasWithState, streaming/windows.py) over the events table via
    a one-shot availableNow stream into a memory sink, and return its
    output. Deterministic because with NoTimeout a session is emitted only
    when a LATER event proves the 30-min gap elapsed — so the result is
    exactly the batch sessionization (x06) minus each user's final
    still-open session, which is what the oracle computes relationally.
    This gives the custom stateful operator itself (not just its batch twin)
    a driver-checkable external signal."""
    from pyspark.sql.types import LongType

    from ducktales_spark.streaming import sessionize

    path = f"{sf_dir}/events.parquet"
    # events.ts ships as parquet TIMESTAMP(NANOS) (see data.table); the
    # legacy conf must stay set while the STREAM runs, not just during
    # schema inference, so restore it only after termination.
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(path).schema
        # FileStreamSource wants a DIRECTORY; point it at the sf dir and
        # glob-filter to the events table
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        if isinstance(src.schema["ts"].dataType, LongType):
            src = src.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        q = (
            sessionize(src, gap_minutes=30)
            .writeStream.format("memory")
            .queryName("x07_sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return spark.table("x07_sessions")
