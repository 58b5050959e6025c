#!/usr/bin/env python
"""Compare AQE on/off per headline query at a given SF dir."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ducktales_spark.registry import load_all
from ducktales_spark.session import get_spark
import bench

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
queries = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "d02_ngram_jaccard", "d03_minhash_lsh",
    "j01_inner_join_revenue_by_region", "e01_cosine_topk",
    "q1_pricing_summary", "x02_event_windows",
]
reps = int(os.environ.get("REPS", "3"))

specs = load_all()
spark = get_spark("aqe-compare")
bench.tune_for_input(spark, sf)
print("partitions:", spark.conf.get("spark.sql.shuffle.partitions"),
      "maxPartitionBytes:", spark.conf.get("spark.sql.files.maxPartitionBytes"))
spark.range(1024).mapInPandas(lambda it: it, "id long").count()

for q in queries:
    row = {}
    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        specs[q].fn(spark, sf).count()  # warm
        best = 9e9
        for _ in range(reps):
            df = specs[q].fn(spark, sf)
            t0 = time.perf_counter()
            df.count()
            best = min(best, time.perf_counter() - t0)
        row[aqe] = best
    print(f"{q}: aqe_on {row['true']*1000:.0f} ms  aqe_off {row['false']*1000:.0f} ms")
