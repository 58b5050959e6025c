"""interval_join: the bucketed range-join operator (an operator Spark lacks
natively; DuckDB plans it as an IEJoin — reference-family inequality join).
Correctness is cross-checked against DuckDB's inequality join on the same
parquet; the plan must contain NO cartesian/nested-loop join at any
granularity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ducktales_spark.data import table
from ducktales_spark.queries.joins import interval_join


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    points = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("iv_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end_ts"),
    )
    return points, intervals


def _oracle_pairs(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return sorted(
        con.execute(
            """
            SELECT c.event_id, e.event_id
            FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts
                  FROM events WHERE event_type = 'click') c
            JOIN (SELECT event_id, user_id, ts::TIMESTAMP AS s,
                         ts::TIMESTAMP + INTERVAL 10 MINUTE AS e
                  FROM events WHERE event_type = 'error') e
              ON c.user_id = e.user_id AND c.ts >= e.s AND c.ts < e.e
            """
        ).fetchall()
    )


@pytest.mark.parametrize("granularity_s", [60, 600, 3600])
def test_interval_join_matches_duckdb_iejoin(
    spark, sf_dir, frames, granularity_s
):
    """Result is granularity-invariant and equals DuckDB's inequality join
    (granularity only shifts cost between interval replication and
    post-join filtering)."""
    points, intervals = frames
    out = interval_join(
        points,
        intervals,
        point_ts="ts",
        start_col="start_ts",
        end_col="end_ts",
        keys=("user_id",),
        granularity_s=granularity_s,
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in out.select("event_id", "iv_id").collect()
    )
    assert got == _oracle_pairs(sf_dir)
    assert len(got) > 0, "fixture corpus produced no in-window pairs"


def test_interval_join_derived_granularity(spark, sf_dir, frames):
    """granularity_s=None derives the bucket width from the intervals' p95
    length: parity with the oracle holds, the plan stays cartesian-free,
    and the derived width equals the (uniform) 10-minute interval length
    so typical replication is bounded at 2 buckets per interval."""
    from ducktales_spark.queries.joins import (
        _bucketed_intervals,
        derived_granularity,
    )

    points, intervals = frames
    g = derived_granularity(intervals, "start_ts", "end_ts")
    assert g == 600  # uniform 10-minute intervals -> p95 == 600 s
    out = interval_join(
        points, intervals, "ts", "start_ts", "end_ts", keys=("user_id",)
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in out.select("event_id", "iv_id").collect()
    )
    assert got == _oracle_pairs(sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # replication bound at the derived width: every interval lands in <= 2
    # buckets (length == granularity can straddle one boundary)
    n_iv = intervals.count()
    n_expl = _bucketed_intervals(
        intervals, "start_ts", "end_ts", g * 1_000_000
    ).count()
    assert n_iv <= n_expl <= 2 * n_iv


def test_interval_join_long_outlier_replication_bounded(spark):
    """Planted long-interval skew: 99 one-hour intervals + one 100-hour
    outlier. The DERIVED granularity tracks the p95 (one hour), so the
    typical interval replicates <= 2x and total explosion stays ~n + tail
    — while a caller-guessed 60 s granularity would replicate every
    interval 60x and the outlier 6000x."""
    from ducktales_spark.queries.joins import (
        _bucketed_intervals,
        derived_granularity,
    )

    rows = [
        (i, f"2024-01-01 {i % 24:02d}:00:00", 3600) for i in range(99)
    ] + [(99, "2024-01-02 00:00:00", 360_000)]
    intervals = (
        spark.createDataFrame(rows, "iv int, s string, len_s long")
        .select(
            "iv",
            F.col("s").cast("timestamp").alias("s"),
            (
                F.col("s").cast("timestamp")
                + F.make_interval(secs=F.col("len_s"))
            ).alias("e"),
        )
    )
    g = derived_granularity(intervals, "s", "e")
    assert g == 3600  # p95 of {99 x 1h, 1 x 100h} is 1 h
    n_expl = _bucketed_intervals(intervals, "s", "e", g * 1_000_000).count()
    # 99 aligned 1-h intervals -> 1 bucket each; outlier -> 100 buckets
    assert n_expl == 99 + 100
    # and the operator still answers correctly over the planted set
    points = spark.createDataFrame(
        [(1, "2024-01-04 02:00:00")], "pid int, ts string"  # outlier + 50 h
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    got = sorted(
        (r["pid"], r["iv"])
        for r in interval_join(points, intervals, "ts", "s", "e").collect()
    )
    assert got == [(1, 99)]  # only the outlier window covers t0+50h


def test_interval_join_no_cartesian(spark, sf_dir, frames):
    """The whole point of the bucketed formulation: the physical plan is an
    equi-join on (bucket, keys) — never CartesianProduct or
    BroadcastNestedLoopJoin, whose cost is |points| x |intervals|."""
    points, intervals = frames
    out = interval_join(
        points, intervals, "ts", "start_ts", "end_ts", keys=("user_id",)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_half_open_and_empty_intervals(spark, frames):
    """Boundary semantics: start inclusive, end exclusive; zero/negative-
    length intervals match nothing."""
    spark_ = frames[0].sparkSession
    points = spark_.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:10:00")],
        "pid int, ts string",
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    intervals = spark_.createDataFrame(
        [
            (10, "2024-01-01 00:00:00", "2024-01-01 00:10:00"),  # [p1, p2)
            (11, "2024-01-01 00:05:00", "2024-01-01 00:05:00"),  # empty
        ],
        "iv int, s string, e string",
    ).select(
        "iv",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    out = interval_join(points, intervals, "ts", "s", "e", granularity_s=60)
    got = sorted((r["pid"], r["iv"]) for r in out.collect())
    assert got == [(1, 10)]  # p1 at start: in; p2 at end: out; empty: out


def test_interval_join_property_random(spark):
    """Randomized brute-force differential: for arbitrary point/interval
    sets (ties, overlaps, empty and negative-length intervals, multiple
    keys), the bucketed equi-join equals the O(n*m) reference filter for
    every granularity."""
    import itertools
    import random

    rng = random.Random(7)
    for trial in range(4):
        points = [
            (i, rng.randint(0, 3), rng.randint(0, 10_000))
            for i in range(40)
        ]
        intervals = []
        for j in range(25):
            s = rng.randint(0, 10_000)
            # include empty and negative-length intervals on purpose
            e = s + rng.randint(-100, 2_000)
            intervals.append((100 + j, rng.randint(0, 3), s, e))
        expected = sorted(
            (p[0], iv[0])
            for p, iv in itertools.product(points, intervals)
            if p[1] == iv[1] and iv[2] <= p[2] < iv[3]
        )
        p_df = spark.createDataFrame(
            points, "pid int, k int, sec int"
        ).selectExpr("pid", "k", "timestamp_seconds(sec) AS ts")
        iv_df = spark.createDataFrame(
            intervals, "iv int, k int, s int, e int"
        ).selectExpr(
            "iv", "k",
            "timestamp_seconds(s) AS s", "timestamp_seconds(e) AS e",
        )
        for gran in (60, 777, 3600):
            got = sorted(
                (r.pid, r.iv)
                for r in interval_join(
                    p_df, iv_df, "ts", "s", "e", keys=("k",),
                    granularity_s=gran,
                ).collect()
            )
            assert got == expected, (trial, gran)


def test_derived_granularity_memoized_per_lineage(spark, frames, monkeypatch):
    """N interval_joins over the same interval table pay the p95 derivation
    job ONCE: the derived width is memoized per (plan semanticHash, cols),
    so only the first default-granularity call runs the eager .first()."""
    from ducktales_spark.queries import joins as J

    points, intervals = frames
    J._GRANULARITY_CACHE.clear()
    calls = {"n": 0}
    # patch the CONCRETE DataFrame class (pyspark 4's sql.DataFrame is an
    # abstract facade; instances are classic.DataFrame with its own first)
    cls = type(intervals)
    real_first = cls.first

    def spy(self, *a, **k):
        calls["n"] += 1
        return real_first(self, *a, **k)

    monkeypatch.setattr(cls, "first", spy)
    g1 = J.derived_granularity(intervals, "start_ts", "end_ts")
    # two more joins over the same lineage: zero additional p95 jobs
    J.interval_join(points, intervals, "ts", "start_ts", "end_ts",
                    keys=("user_id",))
    J.interval_join(points, intervals, "ts", "start_ts", "end_ts",
                    keys=("user_id",))
    assert calls["n"] == 1 and g1 == 600
