#!/usr/bin/env python
"""Simulate the driver's correctness sweep: run every registry query on a
VANILLA SparkSession (none of session.py's tuning — the driver builds its
own) and its oracle SQL on DuckDB at sf0.01, and print one JSON line per
query with rows/schema/values match — the CORRECTNESS_r{N}.json shape.

Usage: python tools/driver_sim.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ent
    from tests.oracle import compare, duckdb_conn

    qs, osql = ent.queries(), ent.oracle_sql()
    con = duckdb_conn(sf_dir)
    failed = 0
    for name, fn in qs.items():
        if only and not any(s in name for s in only):
            continue
        try:
            df = fn(spark, sf_dir)
            problems = compare(df, con, osql[name]) if name in osql else None
            ok = problems is not None and not problems
            if not ok:
                failed += 1
            print(
                json.dumps(
                    {
                        "name": name,
                        "ok": ok,
                        "problems": problems,
                    }
                ),
                flush=True,
            )
        except Exception as e:  # driver records the traceback similarly
            failed += 1
            print(json.dumps({"name": name, "ok": False, "err": repr(e)[:300]}), flush=True)
    print(json.dumps({"failed": failed}), flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
