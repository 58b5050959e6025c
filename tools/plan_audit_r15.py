#!/usr/bin/env python
"""Plan audit for EVERY registered query (driver + EXTRA): build each plan at
a small SF under bench session configs and flag scale red-flags —
BatchEvalPython (row-at-a-time Python), CartesianProduct / BroadcastNestedLoop,
SortMergeJoin, exchange counts, and scans whose ReadSchema is wider than used.

Plan-only (no execution) except the lake-backed queries, which build temp
catalogs per call (cheap at sf0.01). Prints one line per query.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402
from ducktales_spark.registry import load_all, load_extra  # noqa: E402
from ducktales_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

FLAGS = (
    ("pyrow", r"BatchEvalPython"),
    ("cartesian", r"CartesianProduct"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("smj", r"SortMergeJoin"),
)


def main() -> None:
    specs = dict(load_all())
    specs.update({f"EXTRA:{k}": v for k, v in load_extra().items()})
    spark = get_spark("plan-audit-r15")
    bench.tune_for_input(spark, SF_DIR)
    for name, spec in specs.items():
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD-ERROR {type(e).__name__}: {e}", flush=True)
            continue
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_reuse = len(re.findall(r"ReusedExchange", plan))
        n_arrow = len(
            re.findall(r"ArrowEvalPython|MapInPandas|FlatMapCoGroupsInPandas|FlatMapGroupsInPandas", plan)
        )
        hits = [tag for tag, pat in FLAGS if re.search(pat, plan)]
        print(
            f"{name}: exchanges={n_ex} reused={n_reuse} arrow={n_arrow}"
            + (f" FLAGS={','.join(hits)}" if hits else ""),
            flush=True,
        )


if __name__ == "__main__":
    main()
