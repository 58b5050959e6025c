#!/usr/bin/env python
"""r16 decomposition of the two biggest lake_ops costs (r15 verdict item 7):
update_10pct (~0.33 s) and time_travel_reads_x4 (~0.24 s) — how much is
Spark job floor vs rewrite I/O vs footer-stats collection vs catalog txn,
measured the e01/q1 way (reproduce the bench scenario, time each layer
min-of-N in one session).

Usage: python tools/lake_decomp_r16.py [reps]   (SPARK_GRAFT_SF_DIR honored)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402
from ducktales_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scenario_lake(spark):
    """Fresh lake advanced to the pre-update bench state (ctas + 1k insert +
    inlined row + 50k insert = version 4)."""
    from pyspark.sql import functions as F

    from ducktales_spark.lake import connect

    lake_dir = tempfile.mkdtemp(prefix="lake_decomp_")
    lake = connect(f"lake:{lake_dir}", spark)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lake.ctas("orders_l", orders)
    lake.insert("orders_l", orders.limit(1000).withColumn(
        "o_orderkey", F.col("o_orderkey") + 100_000_000))
    row = orders.first().asDict()
    row["o_orderkey"] += 300_000_000
    with lake.transaction() as tx:
        tx.insert_rows("orders_l", [row])
    lake.insert("orders_l", orders.limit(50000).withColumn(
        "o_orderkey", F.col("o_orderkey") + 200_000_000))
    return lake, lake_dir


def main() -> None:
    from pyspark.sql import functions as F

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("lake-decomp-r16")
    bench.tune_for_input(spark, SF_DIR)
    print(f"lake decomp @ {SF_DIR}  loadavg={os.getloadavg()[0]:.2f}",
          flush=True)

    best: dict[str, float] = {}

    def probe(name, fn):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best[name] = min(best.get(name, 9e9), dt)

    for rep in range(reps):
        lake, lake_dir = scenario_lake(spark)
        try:
            st_files = None

            # --- update_10pct layers ---------------------------------
            # (a) full op, reference number
            probe("update_full", lambda: lake.update(
                "orders_l", {"o_totalprice": "o_totalprice * 1.1"},
                "o_orderkey % 10 = 0"))
            # rebuild scenario pieces the update consumed
            src = lake.read("orders_l")
            # (b) pure candidate scan + count (job floor + read)
            probe("scan_count", lambda: src.count())
            # (c) rewrite read+write I/O alone (no observe, no stats, no txn)
            out = src.withColumn(
                "o_totalprice",
                F.when(F.expr("o_orderkey % 10 = 0"),
                       F.expr("o_totalprice * 1.1"))
                .otherwise(F.col("o_totalprice")),
            )
            stage = os.path.join(lake_dir, "probe-stage")
            probe("rewrite_write", lambda: out.write.mode("overwrite")
                  .parquet(stage))
            # (d) footer-stats collection over the staged output (the
            # pyarrow metadata read dominates collect_file_stats)
            import glob as _g

            import pyarrow.parquet as pq

            files = sorted(_g.glob(os.path.join(stage, "*.parquet")))
            probe("footer_stats", lambda: [
                pq.read_metadata(p).to_dict() for p in files])
            print(f"  rep{rep}: staged_files={len(files)}", flush=True)

            # --- time_travel layers ----------------------------------
            probe("tt_read_v1_count",
                  lambda: lake.read("orders_l", version=1).count())
            probe("tt_read_latest_count",
                  lambda: lake.read("orders_l").count())
            # raw-parquet floor: count the same bytes without the lake layer
            raw = spark.read.parquet(f"{SF_DIR}/orders.parquet")
            probe("raw_parquet_count", lambda: raw.count())
            # plan-build share: build the read df, no action
            probe("tt_read_build_only",
                  lambda: lake.read("orders_l", version=1))
        finally:
            shutil.rmtree(lake_dir, ignore_errors=True)
    print(f"post loadavg={os.getloadavg()[0]:.2f}")
    for n, v in sorted(best.items()):
        print(f"{n}: {v:.4f}s")


if __name__ == "__main__":
    main()
