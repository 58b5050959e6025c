#!/usr/bin/env python
"""r16 optimization lab: interleaved A/B timing of candidate operator shapes
with value-parity checks (same protocol as tools/opt_lab_r15.py — one
session, variants interleaved per rep, min-of-N of the bench's quantity:
first execution of a prepared count plan).

Experiments this round:
* assign_p — similarity.assign_buckets_distributed parallelism P (currently
  defaultParallelism; candidates: spark.sql.shuffle.partitions and
  multiples) — r15 verdict item 3.
* route_p — similarity.route_coarse, same knob.
* g01_shj — g01_dedup_components WITH the r15 SHUFFLE_HASH hints (baseline)
  vs the hints stripped (DataFrame.hint no-op'd during the build): the
  sf1/sf10 validation the r15 verdict asked for (item 4).

Usage: python tools/opt_lab_r16.py <experiment> [reps]
Env: SPARK_GRAFT_SF_DIR selects the data dir (replicated sf1/sf10 dirs from
tools/replicate_sf.py work unchanged).
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


def _vectors_and_centroids(spark):
    from pyspark.sql import functions as F

    from ducktales_spark.data import stats_num_rows
    from ducktales_spark.queries.similarity import (
        _vectors,
        n_centroids_for,
    )

    v = _vectors(spark, SF_DIR)
    C = n_centroids_for(v, n=stats_num_rows(SF_DIR, "embeddings"))
    cent = v.filter(F.col("vec_id") < C).select("vec_id", "e")
    return v, cent


def assign_variant(p_expr):
    def fn(spark, sf_dir):
        from ducktales_spark.queries.similarity import (
            assign_buckets_distributed,
        )

        v, cent = _vectors_and_centroids(spark)
        return assign_buckets_distributed(v, cent, n_partitions=p_expr(spark))

    return fn


def route_variant(p_expr):
    def fn(spark, sf_dir):
        import numpy as np
        from pyspark.sql import functions as F

        from ducktales_spark.queries.similarity import route_coarse

        v, cent = _vectors_and_centroids(spark)
        # coarse set = first ceil(sqrt(C)) centroids, the two-level shape
        n_coarse = int(np.ceil(np.sqrt(cent.count())))
        coarse = cent.filter(F.col("vec_id") < n_coarse)
        return route_coarse(v, coarse, route_width=4,
                            n_partitions=p_expr(spark))

    return fn


def _parts(spark):
    return int(spark.conf.get("spark.sql.shuffle.partitions"))


def g01_unhinted(spark, sf_dir):
    """g01 with every .hint() stripped (the three r15 SHUFFLE_HASH labeling
    hints are the only hints on this path) — builds the plan under a
    temporarily no-op'd DataFrame.hint."""
    from pyspark.sql import DataFrame

    specs = load_all()
    orig = DataFrame.hint
    DataFrame.hint = lambda self, *a, **k: self
    try:
        fn = specs["g01_dedup_components"].fn
        return getattr(fn, "__wrapped__", fn)(spark, sf_dir)
    finally:
        DataFrame.hint = orig


def g01_baseline(spark, sf_dir):
    specs = load_all()
    fn = specs["g01_dedup_components"].fn
    return getattr(fn, "__wrapped__", fn)(spark, sf_dir)


EXPERIMENTS = {
    "assign_p": [
        ("P_default_parallelism", assign_variant(
            lambda s: s.sparkContext.defaultParallelism)),
        ("P_shuffle_partitions", assign_variant(_parts)),
        ("P_2x_shuffle_partitions", assign_variant(lambda s: 2 * _parts(s))),
    ],
    "route_p": [
        ("P_default_parallelism", route_variant(
            lambda s: s.sparkContext.defaultParallelism)),
        ("P_shuffle_partitions", route_variant(_parts)),
        ("P_2x_shuffle_partitions", route_variant(lambda s: 2 * _parts(s))),
    ],
    "g01_shj": [
        ("shuffle_hash_hints", g01_baseline),
        ("unhinted_smj", g01_unhinted),
    ],
}


def parity(df_a, df_b) -> bool:
    cols = sorted(df_a.columns)
    a = sorted(map(tuple, df_a.select(*cols).collect()))
    b = sorted(map(tuple, df_b.select(*cols).collect()))
    return a == b


def main() -> None:
    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("opt-lab-r16")
    bench.tune_for_input(spark, SF_DIR)
    variants = EXPERIMENTS[exp]
    print(f"{exp} @ {SF_DIR}  loadavg={os.getloadavg()[0]:.2f}", flush=True)

    # parity first, against variant 0; failures are removed from timing
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

    best: dict[str, float] = {}
    for rep in range(reps):
        for n, fn in variants:
            spark.catalog.clearCache()
            cagg = bench._prepared_exec(fn(spark, SF_DIR))
            t0 = time.perf_counter()
            cagg.collect()
            dt = time.perf_counter() - t0
            best[n] = min(best.get(n, 9e9), dt)
    print(f"post loadavg={os.getloadavg()[0]:.2f}")
    for n, v in best.items():
        print(f"{n}: {v:.3f}s")


if __name__ == "__main__":
    main()
