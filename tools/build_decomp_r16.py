#!/usr/bin/env python
"""r16 §1 decomposition of the pipeline_ops_build hot spots (c05/c07/g01/
v01): where does the builder latency actually go — py4j Column construction,
Catalyst analysis/optimization (plan_bytes' stats probe), scenario Spark
jobs (g01's convergence loop, v01's index build), or _prepared_exec
planning?  Pure measurement, no engine change.

Usage: python tools/build_decomp_r16.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402
from ducktales_spark.registry import load_all  # noqa: E402
from ducktales_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, reps, warm=True):
    if warm:
        fn()
    best = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {best:.3f}s", flush=True)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("build-decomp-r16")
    bench.tune_for_input(spark, SF_DIR)
    specs = load_all()
    from pyspark.sql import functions as F

    from ducktales_spark.corpus import plan_bytes
    from ducktales_spark.data import table
    from ducktales_spark.queries.dedup import (
        minhash_band_table,
        minhash_signatures,
    )

    print(f"decomp @ {SF_DIR} loadavg={os.getloadavg()[0]:.2f}", flush=True)

    docs = table(spark, SF_DIR, "documents")
    bench_df = docs.filter(F.col("doc_id") % 7 == 0)

    print("c05 fuzzy build phases:", flush=True)
    t("minhash_signatures(docs) construct", lambda: minhash_signatures(docs), reps)
    sig = minhash_signatures(docs)
    t("minhash_band_table(sig) construct", lambda: minhash_band_table(sig), reps)
    bands = minhash_band_table(minhash_signatures(bench_df))
    t("plan_bytes(bench bands)  [optimizedPlan().stats()]",
      lambda: plan_bytes(bands), reps)
    t("c05 fn() construct only", lambda: specs["c05_decontaminate_fuzzy"].fn(spark, SF_DIR), reps)
    t("c05 fn() + prepared_exec",
      lambda: bench._prepared_exec(specs["c05_decontaminate_fuzzy"].fn(spark, SF_DIR)), reps)

    print("c07 both build phases:", flush=True)
    t("c07 fn() construct only", lambda: specs["c07_decontaminate_both"].fn(spark, SF_DIR), reps)
    t("c07 fn() + prepared_exec",
      lambda: bench._prepared_exec(specs["c07_decontaminate_both"].fn(spark, SF_DIR)), reps)

    print("g01 scenario phases:", flush=True)
    # the convergence loop runs REAL jobs inside fn(); count them
    sc = spark.sparkContext

    def g01_fn():
        return specs["g01_dedup_components"].fn(spark, SF_DIR)

    jobs0 = sc._jsc.sc().dagScheduler().numTotalJobs()
    t0 = time.perf_counter()
    g01_fn()
    dt_first = time.perf_counter() - t0
    jobs1 = sc._jsc.sc().dagScheduler().numTotalJobs()
    print(f"  g01 fn() one-shot: {dt_first:.3f}s, {jobs1 - jobs0} Spark jobs", flush=True)
    t("g01 fn() construct (loop incl.)", g01_fn, reps)
    t("g01 fn() + prepared_exec",
      lambda: bench._prepared_exec(g01_fn()), reps)

    # inner decomposition: one large+small star round vs the convergence check
    from ducktales_spark.graph import _star_round

    d = table(spark, SF_DIR, "documents").select("doc_id", "lang")
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"))
    b = d.select((F.col("doc_id") - 1).alias("doc_a"),
                 F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"))
    pairs = (a.join(b, "doc_a").filter(F.col("lang_a") == F.col("lang_b"))
             .select("doc_a", "doc_b"))
    raw = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    cur = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()

    t("one star round + localCheckpoint",
      lambda: _star_round(cur).localCheckpoint(), reps)
    nxt = _star_round(cur).localCheckpoint()
    t("convergence check (tagged-union count)",
      lambda: (cur.withColumn("__t", F.lit(1))
               .unionByName(nxt.withColumn("__t", F.lit(2)))
               .groupBy("u", "v").agg(F.sum("__t").alias("__s"))
               .filter(F.col("__s") != 3).limit(1).count()), reps)

    print("v01 phases:", flush=True)
    t("v01 fn() construct (index build incl.)",
      lambda: specs["v01_vector_index_probe"].fn(spark, SF_DIR), max(2, reps // 2))
    t("v01 fn() + prepared_exec",
      lambda: bench._prepared_exec(specs["v01_vector_index_probe"].fn(spark, SF_DIR)),
      max(2, reps // 2))

    print(f"post loadavg={os.getloadavg()[0]:.2f}", flush=True)


if __name__ == "__main__":
    main()
