#!/usr/bin/env python
"""j01 constant-factor investigation at sf10 (VERDICT r3 item 5).

(a) Confirm the orders scan is column-pruned (ReadSchema) and filters are
    where expected; (b) interleaved min-of-N sweep of
    spark.sql.files.maxPartitionBytes around the tuner's choice — cold-cache
    effects neutralized by round-robin order (memory: A-then-B flatters B).

Usage: python tools/j01_sweep.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

from ducktales_spark.registry import load_all
from ducktales_spark.session import get_spark
from bench import tune_for_input

spark = get_spark("j01-sweep")
spark.sparkContext.setLogLevel("ERROR")
tune_for_input(spark, sf_dir)
specs = load_all()
fn = specs["j01_inner_join_revenue_by_region"].fn

plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
for line in plan.splitlines():
    if "ReadSchema" in line:
        print("SCAN:", line.strip()[:220])

base_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
print("tuner split:", base_split >> 20, "MiB")
settings = [8, 16, 24, 32, 48, 64, 128]
times = {s: [] for s in settings}
fn(spark, sf_dir).count()  # warm page cache + codegen once
for r in range(reps):
    for s in settings:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(s << 20))
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times[s].append(time.perf_counter() - t0)
for s in settings:
    print(f"split {s:>4} MiB  min {min(times[s]):.3f}  med {sorted(times[s])[len(times[s])//2]:.3f}")
