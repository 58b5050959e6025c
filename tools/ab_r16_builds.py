#!/usr/bin/env python
"""Interleaved A/B of the r16 build-path optimizations (one session,
min-of-N, value parity first — the bench-measurement protocol):

* g01_round — the r15 groupBy+join star round (reconstructed inline) vs
  the r16 window-fused _star_round, through the FULL g01 query (loop +
  labeling): build time (fn construction incl. convergence loop jobs +
  prepared_exec planning) and exec time (first execution of the prepared
  count plan), i.e. exactly the bench's pipeline_ops_build / pipeline_ops
  quantities.
* fuzzy_build — c05 with the old minhash_band_table(minhash_signatures())
  composition vs the new single-SQL minhash_bands: same two quantities.

Usage: python tools/ab_r16_builds.py <g01_round|fuzzy_build> [reps]
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


def _old_star_round(edges):
    """The pre-r16 formulation: groupBy-min + join large star (with the
    inter-star distinct), groupBy-min + join small star."""
    from pyspark.sql import functions as F

    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", "u").alias("m")
    )
    large = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    directed = large.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m2 = directed.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = directed.join(m2, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    centers = m2.select(F.col("u"), F.col("m").alias("v"))
    return (
        nbrs.unionByName(centers)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _old_connected_components(edges, src="doc_a", dst="doc_b", max_rounds=50):
    from pyspark.sql import functions as F

    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    cur = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    for _ in range(max_rounds):
        nxt = _old_star_round(cur).localCheckpoint()
        changed = (
            nxt.exceptAll(cur).limit(1).count()
            or cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if not changed:
            break
    else:
        raise RuntimeError("no convergence")
    labeled = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    singletons = (
        all_nodes.join(labeled.hint("shuffle_hash"), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    return labeled.unionByName(singletons).distinct()


def g01_old(spark, sf_dir):
    from pyspark.sql import functions as F

    pairs, docs = _g01_pairs_docs(spark)
    comp = _old_connected_components(pairs)
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


def g01_new(spark, sf_dir):
    from ducktales_spark.registry import load_all

    fn = load_all()["g01_dedup_components"].fn
    return getattr(fn, "__wrapped__", fn)(spark, sf_dir)


def c05_old(spark, sf_dir):
    from pyspark.sql import functions as F

    from ducktales_spark.corpus import _bench_side
    from ducktales_spark.data import table
    from ducktales_spark.queries.dedup import (
        est_jaccard,
        minhash_band_table,
        minhash_signatures,
    )

    docs = table(spark, sf_dir, "documents")
    bench_df = docs.filter(F.col("doc_id") % 7 == 0)
    bench_bands = minhash_band_table(minhash_signatures(bench_df)).select(
        "band_id", "band_key",
        F.col("doc_id").alias("__bench_id"), F.col("sig").alias("__bench_sig"),
    )
    bands = minhash_band_table(minhash_signatures(docs))
    scored = bands.join(
        _bench_side(bench_bands, 256 << 20), ["band_id", "band_key"]
    ).withColumn("__est_j", est_jaccard(F.col("sig"), F.col("__bench_sig")))
    return (
        scored.filter(F.col("__est_j") >= 0.8)
        .groupBy("doc_id")
        .agg(
            F.count_distinct("__bench_id").alias("n_hits"),
            F.max("__est_j").alias("max_jaccard"),
        )
        .filter(F.col("n_hits") >= 1)
        .withColumn("n_hits", F.col("n_hits").cast("long"))
    )


def c05_new(spark, sf_dir):
    from ducktales_spark.registry import load_all

    fn = load_all()["c05_decontaminate_fuzzy"].fn
    return getattr(fn, "__wrapped__", fn)(spark, sf_dir)


EXPERIMENTS = {
    "g01_round": [("old_join_round", g01_old), ("new_window_round", g01_new)],
    "fuzzy_build": [("old_df_api", c05_old), ("new_single_sql", c05_new)],
}


def parity(df_a, df_b) -> bool:
    cols = sorted(df_a.columns)
    a = sorted(map(tuple, df_a.select(*cols).collect()))
    b = sorted(map(tuple, df_b.select(*cols).collect()))
    return a == b


def main() -> None:
    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("ab-r16-builds")
    bench.tune_for_input(spark, SF_DIR)
    variants = EXPERIMENTS[exp]
    print(f"{exp} @ {SF_DIR}  loadavg={os.getloadavg()[0]:.2f}", flush=True)

    base_df = variants[0][1](spark, SF_DIR)
    passing = [variants[0]]
    for n, fn in variants[1:]:
        ok = parity(base_df, fn(spark, SF_DIR))
        print(f"parity {n}: {ok}", flush=True)
        if ok:
            passing.append((n, fn))
        else:
            print(f"PARITY FAILURE — {n} dropped from timing", flush=True)
    variants = passing

    for _, fn in variants:  # warmup
        fn(spark, SF_DIR).count()

    build_best: dict[str, float] = {}
    exec_best: dict[str, float] = {}
    for rep in range(reps):
        for n, fn in variants:
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
