#!/usr/bin/env python
"""Interactive profiling shell: bench-identical session + helpers.

Usage: python -i tools/prof.py   (then call t("d03_minhash_lsh"), stages(df), ...)
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ducktales_spark.registry import load_all  # noqa: E402
from ducktales_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
specs = load_all()
spark = get_spark("prof")
bench.tune_for_input(spark, SF)
spark.range(1024).mapInPandas(lambda it: it, "id long").count()
spark.range(16).toPandas()


def t(name, reps=6, sf=SF):
    """Min-of-reps execution time of a registered query (bench protocol)."""
    best = None
    specs[name].fn(spark, sf).count()  # warm
    for _ in range(reps):
        spark.catalog.clearCache()
        df = specs[name].fn(spark, sf)
        t0 = time.perf_counter()
        df.count()
        best = min(best or 9e9, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.0f} ms")
    return best


def tdf(fn, reps=6):
    """Min-of-reps for a thunk returning a DataFrame."""
    fn().count()
    best = None
    for _ in range(reps):
        df = fn()
        t0 = time.perf_counter()
        df.count()
        best = min(best or 9e9, time.perf_counter() - t0)
    print(f"{best*1000:.0f} ms")
    return best
