#!/usr/bin/env python
"""Interleaved A/B: fuse TWO star rounds per Spark job in g01's
connected-components convergence loop (one session, min-of-N, value parity
first — the bench-measurement protocol).

Hypothesis (guide §1.2 / §2.4): at bench scale each round job is dominated
by fixed job overhead (DAG submission + stage scheduling of a 3-exchange
job), so running rounds in PAIRS — round k+1 computed directly on round
k's un-materialized output inside the same job, convergence tested between
the pair's two outputs — halves the job count for the same total compute.
The intermediate round's ``distinct()`` can also be dropped (window mins
are multiset-invariant; the pair's final distinct collapses duplicates),
saving one exchange per pair at the cost of ≤2x rows through the second
round's windows.

Convergence stays EXACT: the loop stops when set(n1) == set(n2), i.e. when
one application of _star_round leaves the edge set unchanged — the
original criterion, just tested one round earlier (no 2-cycle assumption).
The n1-side of the test is a multiset when the intermediate distinct is
dropped, so the tag test uses min/max tag presence, not tag-sum.

Variants:
  cur           — the landed r16 single-round loop (registry g01)
  fused2        — double round per job, intermediate distinct KEPT
  fused2_nodist — double round per job, intermediate distinct DROPPED

Usage: python tools/g01_fuse_r16.py [reps] (SPARK_GRAFT_SF_DIR selects SF)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402
from ducktales_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROUNDS_SEEN: dict[str, int] = {}


def _star_round_raw(edges, dedup: bool):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    wu = W.partitionBy("u")
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    ls = (
        sym.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    sm = ls.withColumn("m", F.min("v").over(wu))
    out = (
        sm.select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                    F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .filter(F.col("u") != F.col("v"))
    )
    return out.distinct() if dedup else out


def _fused_connected_components(
    edges, src, dst, tag: str, mid_dedup: bool, max_rounds: int = 50
):
    from pyspark.sql import functions as F

    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    cur = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    rounds = 0
    for _ in range(max_rounds):
        n1 = _star_round_raw(cur, dedup=mid_dedup).localCheckpoint(eager=False)
        nxt = _star_round_raw(n1, dedup=True).localCheckpoint(eager=False)
        rounds += 2
        # converged iff set(n1) == set(nxt): presence-of-both-tags test
        # (min/max, not sum — n1 may be a multiset when mid_dedup=False)
        changed = (
            n1.select("u", "v", F.lit(1).alias("__t"))
            .unionByName(nxt.select("u", "v", F.lit(2).alias("__t")))
            .groupBy("u", "v")
            .agg(F.min("__t").alias("__lo"), F.max("__t").alias("__hi"))
            .filter((F.col("__lo") != 1) | (F.col("__hi") != 2))
            .limit(1)
            .count()
        )
        cur = nxt
        if not changed:
            break
    else:
        raise RuntimeError("no convergence")
    ROUNDS_SEEN[tag] = rounds
    labeled = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    singletons = (
        all_nodes.join(labeled.hint("shuffle_hash"), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    return labeled.unionByName(singletons).distinct()


def _g01_pairs_docs(spark):
    from pyspark.sql import functions as F

    from ducktales_spark.data import table

    d = table(spark, SF_DIR, "documents").select("doc_id", "lang")
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"))
    b = d.select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
    )
    pairs = (
        a.join(b, "doc_a")
        .filter(F.col("lang_a") == F.col("lang_b"))
        .select("doc_a", "doc_b")
    )
    return pairs, d.select("doc_id")


def _g01_with(comp_fn, spark):
    from pyspark.sql import functions as F

    pairs, docs = _g01_pairs_docs(spark)
    comp = comp_fn(pairs)
    matched = docs.join(comp, F.col("doc_id") == comp["node"]).select(
        "doc_id", "component"
    )
    canon = matched.groupBy("component").agg(
        F.min("doc_id").alias("canonical_id")
    )
    matched_out = matched.join(canon.hint("shuffle_hash"), "component").select(
        "doc_id", "canonical_id"
    )
    singles = (
        docs.join(
            comp.hint("shuffle_hash"),
            F.col("doc_id") == comp["node"],
            "left_anti",
        ).select("doc_id", F.col("doc_id").alias("canonical_id"))
    )
    return matched_out.unionByName(singles).withColumn(
        "is_survivor", F.col("doc_id") == F.col("canonical_id")
    )


def g01_cur(spark, sf_dir):
    from ducktales_spark.registry import load_all

    fn = load_all()["g01_dedup_components"].fn
    return getattr(fn, "__wrapped__", fn)(spark, sf_dir)


def g01_fused2(spark, sf_dir):
    return _g01_with(
        lambda p: _fused_connected_components(
            p, "doc_a", "doc_b", "fused2", mid_dedup=True
        ),
        spark,
    )


def g01_fused2_nodist(spark, sf_dir):
    return _g01_with(
        lambda p: _fused_connected_components(
            p, "doc_a", "doc_b", "fused2_nodist", mid_dedup=False
        ),
        spark,
    )


VARIANTS = [
    ("cur", g01_cur),
    ("fused2", g01_fused2),
    ("fused2_nodist", g01_fused2_nodist),
]


def parity(df_a, df_b) -> bool:
    cols = sorted(df_a.columns)
    a = sorted(map(tuple, df_a.select(*cols).collect()))
    b = sorted(map(tuple, df_b.select(*cols).collect()))
    return a == b


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("g01-fuse-r16")
    bench.tune_for_input(spark, SF_DIR)
    print(f"g01_fuse @ {SF_DIR}  loadavg={os.getloadavg()[0]:.2f}", flush=True)

    base_df = VARIANTS[0][1](spark, SF_DIR)
    passing = [VARIANTS[0]]
    for n, fn in VARIANTS[1:]:
        ok = parity(base_df, fn(spark, SF_DIR))
        print(f"parity {n}: {ok}", flush=True)
        if ok:
            passing.append((n, fn))
        else:
            print(f"PARITY FAILURE — {n} dropped from timing", flush=True)

    sc = spark.sparkContext

    def jobs() -> int:
        return sc._jsc.sc().dagScheduler().numTotalJobs()

    for n, fn in passing:  # warmup + job count
        j0 = jobs()
        fn(spark, SF_DIR).count()
        print(f"{n}: {jobs() - j0} jobs/run, rounds={ROUNDS_SEEN}", flush=True)

    build_best: dict[str, float] = {}
    exec_best: dict[str, float] = {}
    for _ in range(reps):
        for n, fn in passing:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            cagg = bench._prepared_exec(fn(spark, SF_DIR))
            tb = time.perf_counter() - t0
            t0 = time.perf_counter()
            cagg.collect()
            dt = time.perf_counter() - t0
            build_best[n] = min(build_best.get(n, 9e9), tb)
            exec_best[n] = min(exec_best.get(n, 9e9), dt)
    print(f"post loadavg={os.getloadavg()[0]:.2f}")
    for n in build_best:
        print(f"{n}: build {build_best[n]:.3f}s  exec {exec_best[n]:.3f}s")


if __name__ == "__main__":
    main()
