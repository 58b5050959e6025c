#!/usr/bin/env python
"""A/B scan-split experiment: current tuner (maxPartitionBytes sized to the
largest table) vs per-scan adaptive splitting (minPartitionNum so EVERY
table fans out, openCost=1MB). Interleaved reps in one JVM so JIT warmth is
shared; reports per-query min per config.

CONCLUSION (sf10, 5 interleaved reps, min-of-reps): A 30.45 s vs B 33.67 s
total — the current tuner WINS; keep it. Earlier single-pass measurements
that showed B dramatically ahead (w02 0.79->0.32 etc.) were cold-page-cache
artifacts: B's first pass ran after A had already paged the parquet in.
Per-query warm mins: B helps only w02 (0.66->0.53) and d03 (10.4->9.0,
within this host's noise band), while costing d02 (14.0->17.8), j01
(1.13->1.52), a09 (0.87->1.20) — the finer splits fragment the shingle/
band-join stages' input into more, smaller tasks whose per-task overhead
exceeds the extra parallelism on warm data."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE, tune_for_input  # noqa: E402
from ducktales_spark.registry import load_all  # noqa: E402
from ducktales_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("REPS", "5"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")


def set_config(spark, which: str, sf_dir: str) -> None:
    tune_for_input(spark, sf_dir)  # baseline: shuffle parts + AQE off
    cores = spark.sparkContext.defaultParallelism
    if which == "B":
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
        spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 20))
        spark.conf.set("spark.sql.files.minPartitionNum", str(2 * cores))
    else:
        spark.conf.unset("spark.sql.files.minPartitionNum")
        spark.conf.set("spark.sql.files.openCostInBytes", str(4 << 20))


def main() -> None:
    specs = load_all()
    spark = get_spark("split-exp")
    warm = "/root/testdata/sf0.001"
    spark.range(1024).mapInPandas(lambda it: it, "id long").count()
    for cfg in ("A", "B"):
        set_config(spark, cfg, warm)
        for name in HEADLINE:
            specs[name].fn(spark, warm).count()

    best: dict[str, dict[str, float]] = {n: {} for n in HEADLINE}
    for rep in range(REPS):
        for cfg in ("A", "B"):
            set_config(spark, cfg, SF_DIR)
            spark.catalog.clearCache()
            for name in HEADLINE:
                df = specs[name].fn(spark, SF_DIR)
                t0 = time.perf_counter()
                df.count()
                dt = time.perf_counter() - t0
                cur = best[name].get(cfg)
                best[name][cfg] = dt if cur is None else min(cur, dt)
        print(
            json.dumps(
                {
                    "rep": rep,
                    **{
                        n: {k: round(v, 3) for k, v in d.items()}
                        for n, d in best.items()
                    },
                }
            ),
            flush=True,
        )
    tot = {
        cfg: round(sum(best[n][cfg] for n in HEADLINE), 3) for cfg in ("A", "B")
    }
    print(json.dumps({"totals": tot}), flush=True)


if __name__ == "__main__":
    main()
