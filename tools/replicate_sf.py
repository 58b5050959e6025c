#!/usr/bin/env python
"""Materialize a K-times-larger copy of a driver sf directory.

The driver ships sf0.001/0.01/0.1 only; at sf<=0.1 Spark's fixed per-query
cost (~0.2-0.4 s of scheduling + py4j) dominates every headline ratio, so
scaling behavior is invisible. This tool replicates sf0.1 K times into a
writable dir (default /tmp/sf1) so bench.py can run at an sf1-equivalent
volume: `python tools/replicate_sf.py && SPARK_GRAFT_SF_DIR=/tmp/sf1
python bench.py`.

Replication semantics — each copy k is an independent shard:
* fact keys are offset per copy (orderkey/custkey/doc_id/vec_id/event_id/
  user_id), so every intra-copy join relationship is preserved and keys
  never collide across copies;
* dimension tables (region/nation/supplier/part) are NOT replicated —
  facts in every copy join to the same dims, exactly how a 10x-bigger
  TPC-H world shares its geography;
* documents' text is word-suffixed per copy (`w` -> `w_k`, copy 0
  untouched), so copies share ZERO shingles: the near-dup corpus scales
  like K independent corpora instead of planting K-way exact duplicates
  that would quadratically inflate every dedup query's output;
* embeddings keep their vectors (candidate pool grows 10x; the e01/e02
  query set stays the fixed low-id vectors of copy 0).

DuckDB does the rewrite (single parquet file per table, which both
spark.read.parquet and the bench's DuckDB twin read directly).
"""

from __future__ import annotations

import argparse
import os

import duckdb

OFF = 100_000_000  # per-copy key offset; far above any sf0.1 key

COPY_AS_IS = ["region", "nation", "supplier", "part"]

REPLICATED = {
    "lineitem": "SELECT * EXCLUDE (k) REPLACE (l_orderkey + k * {off} AS l_orderkey)",
    "orders": (
        "SELECT * EXCLUDE (k) REPLACE (o_orderkey + k * {off} AS o_orderkey,"
        " o_custkey + k * {off} AS o_custkey)"
    ),
    "customer": "SELECT * EXCLUDE (k) REPLACE (c_custkey + k * {off} AS c_custkey)",
    "events": (
        "SELECT * EXCLUDE (k) REPLACE (event_id + k * {off} AS event_id,"
        " user_id + k * {off} AS user_id)"
    ),
    "documents": (
        "SELECT * EXCLUDE (k) REPLACE (doc_id + k * {off} AS doc_id,"
        " CASE WHEN k = 0 THEN text ELSE array_to_string("
        "   list_transform(string_split(text, ' '), w -> w || '_' || k),"
        "   ' ') END AS text,"
        " CASE WHEN k = 0 THEN n_chars ELSE length(array_to_string("
        "   list_transform(string_split(text, ' '), w -> w || '_' || k),"
        "   ' ')) END AS n_chars)"
    ),
    "embeddings": "SELECT * EXCLUDE (k) REPLACE (vec_id + k * {off} AS vec_id)",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet')"
            f" TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, sel in REPLICATED.items():
        body = sel.format(off=OFF)
        con.execute(
            f"COPY ({body} FROM '{args.src}/{t}.parquet'"
            f" CROSS JOIN (SELECT unnest(range({args.copies})) AS k) ks)"
            f" TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{args.dst}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
