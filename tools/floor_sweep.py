#!/usr/bin/env python
"""Measured-floor decomposition for the small weak-ratio queries at sf10.

a09 / w02 / o01 / x02 sit >2x their DuckDB twin at sf10 while being <=1.3 s
absolute. This tool measures WHERE that second goes: for each query it
interleaves (cold-cache-neutral, min-of-N in one JVM)

  scan   — a minimal aggregate (max per column) over exactly the columns
           the query's plan reads (ReadSchema-verified), which forces the
           parquet DECODE of those columns (a bare COUNT would shortcut to
           footer row counts and measure nothing);
  full   — the query itself.

If full - scan is small, the gap vs the twin is the JVM parquet-scan
constant against DuckDB's vectorized reader — a fixed per-row decode cost,
flat in SF — and there is no plan rewrite to chase (the compute-heavy
queries on the same scans are 3-20x FASTER than the twin, so the reader
gap is real but bounded).

Usage: python tools/floor_sweep.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

from ducktales_spark.registry import load_all
from ducktales_spark.session import get_spark
from bench import tune_for_input

QUERIES = {
    "a09_groupby_multikey": ("lineitem", None),
    "w02_topk_per_group": ("orders", None),
    "o01_sort_limit_topk": ("orders", None),
    "x02_event_windows": ("events", None),
}

spark = get_spark("floor-sweep")
spark.sparkContext.setLogLevel("ERROR")
tune_for_input(spark, sf_dir)
specs = load_all()

# derive each query's actual ReadSchema -> a decode-forcing scan twin
from pyspark.sql import functions as F

from ducktales_spark.data import table

scan_dfs = {}
for name, (tbl, _) in QUERIES.items():
    plan = specs[name].fn(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    scans = []  # one decode-forcing agg per FileScan in the plan
    for m in re.finditer(
        r"(\w+)\.parquet.*?ReadSchema: struct<([^>]*)>", plan
    ):
        t, schema = m.group(1), m.group(2)
        cols = sorted({c.split(":")[0].strip() for c in schema.split(",") if c})
        df = table(spark, sf_dir, t).select(*cols)
        scans.append((t, cols, df.agg(*[F.max(c) for c in cols])))
    scan_dfs[name] = scans
    print(f"{name}: scans = {[(t, c) for t, c, _ in scans]}")

# warm
for name in QUERIES:
    specs[name].fn(spark, sf_dir).count()

mins: dict = {}
for rep in range(reps):
    for name in QUERIES:
        t0 = time.perf_counter()
        for _, _, agg_df in scan_dfs[name]:
            agg_df.count()
        dt = time.perf_counter() - t0
        k = (name, "scan")
        mins[k] = min(mins.get(k, dt), dt)
        df = specs[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.count()
        dt = time.perf_counter() - t0
        k = (name, "full")
        mins[k] = min(mins.get(k, dt), dt)

for name in QUERIES:
    s, f = mins[(name, "scan")], mins[(name, "full")]
    print(
        f"{name}: scan {s:.3f}s  full {f:.3f}s  "
        f"non-scan {f - s:.3f}s ({100 * (f - s) / f:.0f}%)"
    )
