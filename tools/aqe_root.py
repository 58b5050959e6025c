#!/usr/bin/env python
"""Root-cause AQE slowdown on d03: AQE+coalesce-off vs AQE-on vs AQE-off."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ducktales_spark.registry import load_all
from ducktales_spark.session import get_spark
import bench

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
q = sys.argv[2] if len(sys.argv) > 2 else "d03_minhash_lsh"
specs = load_all()
spark = get_spark("aqe-root")
bench.tune_for_input(spark, sf)
spark.range(1024).mapInPandas(lambda it: it, "id long").count()

modes = [
    ("aqe_on", {"spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.coalescePartitions.enabled": "true"}),
    ("aqe_on_no_coalesce", {"spark.sql.adaptive.enabled": "true",
                            "spark.sql.adaptive.coalescePartitions.enabled": "false"}),
    ("aqe_off", {"spark.sql.adaptive.enabled": "false"}),
]
for name, conf in modes:
    for k, v in conf.items():
        spark.conf.set(k, v)
    best = 9e9
    for _ in range(2):
        df = specs[q].fn(spark, sf)
        t0 = time.perf_counter()
        df.count()
        best = min(best, time.perf_counter() - t0)
    print(f"{q} {name}: {best*1000:.0f} ms")
