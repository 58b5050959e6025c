#!/usr/bin/env python
"""r16 v01 lab: interleaved A/B of the vector-index build+probe fixes.

Variant "old" reconstructs the pre-r16 behavior inside the same session:
* DataFrame.localCheckpoint no-op'd -> the clustered ctas's range-sampling
  pass re-executes the Python assignment kernel (the double-execution the
  lake fix removes). The only localCheckpoint on the v01 path is the lake
  fix itself, so the no-op is surgical here.
* vector_index._COARSE_THRESHOLD forced to -1 -> the probe's centroid
  ranking always takes the distributed Arrow-kernel path (the driver-rank
  short circuit never fires).

Variant "new" is the checked-in code. Per rep (interleaved) we time the
bench's two pipeline_ops quantities separately: BUILD = fn() + planning
(where both fixes live), EXEC = first execution of the prepared probe
count plan (should be unchanged). Spark JOB COUNTS per build are recorded
via the status tracker — the fixes' claim is "fewer jobs", so the counter
is the plan-level evidence.

Usage: python tools/v01_lab_r16.py [reps]   (SPARK_GRAFT_SF_DIR honored)
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


def build_v01(spark):
    specs = load_all()
    fn = specs["v01_vector_index_probe"].fn
    return getattr(fn, "__wrapped__", fn)(spark, SF_DIR)


class OldBehavior:
    """Context manager flipping the session to the pre-r16 v01 shape."""

    def __enter__(self):
        from pyspark.sql import DataFrame

        import ducktales_spark.vector_index as vi

        self._ckpt = DataFrame.localCheckpoint
        self._thresh = vi._COARSE_THRESHOLD
        DataFrame.localCheckpoint = lambda self, eager=True: self
        vi._COARSE_THRESHOLD = -1
        return self

    def __exit__(self, *exc):
        from pyspark.sql import DataFrame

        import ducktales_spark.vector_index as vi

        DataFrame.localCheckpoint = self._ckpt
        vi._COARSE_THRESHOLD = self._thresh
        return False


def n_jobs(spark):
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("v01-lab-r16")
    bench.tune_for_input(spark, SF_DIR)
    print(f"v01 @ {SF_DIR}  loadavg={os.getloadavg()[0]:.2f}", flush=True)

    # value parity first: old shape vs new shape, sorted collect
    with OldBehavior():
        old_rows = sorted(map(tuple, build_v01(spark).collect()))
    new_rows = sorted(map(tuple, build_v01(spark).collect()))
    ok = old_rows == new_rows
    print(f"parity old==new: {ok}  ({len(new_rows)} rows)", flush=True)
    if not ok:
        print("PARITY FAILURE — aborting")
        sys.exit(1)

    best: dict[str, float] = {}
    jobs: dict[str, int] = {}
    for rep in range(reps):
        for name, ctx in (("old", OldBehavior), ("new", None)):
            spark.catalog.clearCache()
            j0 = n_jobs(spark)
            t0 = time.perf_counter()
            if ctx:
                with ctx():
                    df = build_v01(spark)
                    cagg = bench._prepared_exec(df)
            else:
                df = build_v01(spark)
                cagg = bench._prepared_exec(df)
            tb = time.perf_counter() - t0
            jobs[name] = n_jobs(spark) - j0
            t0 = time.perf_counter()
            cagg.collect()
            te = time.perf_counter() - t0
            best[f"{name}_build"] = min(best.get(f"{name}_build", 9e9), tb)
            best[f"{name}_exec"] = min(best.get(f"{name}_exec", 9e9), te)
    print(f"post loadavg={os.getloadavg()[0]:.2f}")
    for n, v in sorted(best.items()):
        print(f"{n}: {v:.3f}s")
    for n, v in sorted(jobs.items()):
        print(f"{n}_build_jobs: {v}")


if __name__ == "__main__":
    main()
