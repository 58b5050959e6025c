#!/usr/bin/env python
"""r15 optimization lab: interleaved A/B timing of candidate query shapes
against the registered baselines, with value-parity checks.

Each variant is a (name, builder) pair; timing is the bench's quantity
(first execution of a prepared count plan, min over interleaved reps).
Usage: python tools/opt_lab_r15.py <experiment> [reps]
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


def d02_variant_b(spark, sf_dir):
    """d02 with the df-capped shingle table materialized behind a SECOND
    exchange (REPARTITION(h) above the window filter): the Sort+Window+Filter
    compute ONCE and all three consumers (self-join a/b, cnt) read the new
    exchange, vs the baseline recomputing sort+window+filter per consumer.
    Price: one more shuffle of the capped (int64,int64) rows + a stage
    barrier."""
    from ducktales_spark.data import table
    from ducktales_spark.queries.dedup import _MAX_SHINGLE_DF

    d = table(spark, sf_dir, "documents")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return spark.sql(
        f"""
    WITH src AS (
      SELECT /*+ REPARTITION({n_part}, doc_id) */ doc_id, text FROM {{docs}}
    ),
    toks AS (
      SELECT doc_id, ws FROM (
        SELECT doc_id, split(trim(text), '\\\\s+') AS ws FROM src
      ) WHERE size(ws) >= 3
    ),
    sh0 AS (
      SELECT DISTINCT doc_id,
             xxhash64(element_at(ws, p), element_at(ws, p + 1),
                      element_at(ws, p + 2)) AS h
      FROM (SELECT doc_id, ws,
                   explode(sequence(1, size(ws) - 2)) AS p FROM toks)
    ),
    sh AS (
      SELECT /*+ REPARTITION({n_part}, h) */ doc_id, h FROM (
        SELECT doc_id, h, count(1) OVER (PARTITION BY h) AS df FROM sh0
      ) WHERE df <= {_MAX_SHINGLE_DF}
    ),
    cnt AS (SELECT doc_id, count(1) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT /*+ SHUFFLE_HASH(b) */
             a.doc_id AS doc_a, b.doc_id AS doc_b, count(1) AS c
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT /*+ BROADCAST(ca), BROADCAST(cb) */
           doc_a, doc_b,
           round(c * 1.0D / (ca.n + cb.n - c), 6) AS jaccard
    FROM inter
    JOIN cnt ca ON doc_a = ca.doc_id
    JOIN cnt cb ON doc_b = cb.doc_id
    WHERE c * 1.0D / (ca.n + cb.n - c) >= 0.2
    """,
        docs=d,
    )


def d02_variant_agg(spark, sf_dir):
    """d02 with the df cap computed as a groupBy(h) aggregate joined back on
    h (both sides ride the same E(h) exchange; SHUFFLE_HASH so no sorts) —
    removes the WindowExec sorts entirely; the cap-join recomputes per
    consumer like the window did, but a hash build over distinct h is
    cheaper than a sort of all rows when rows >> distinct h."""
    from ducktales_spark.data import table
    from ducktales_spark.queries.dedup import _MAX_SHINGLE_DF

    d = table(spark, sf_dir, "documents")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return spark.sql(
        f"""
    WITH src AS (
      SELECT /*+ REPARTITION({n_part}, doc_id) */ doc_id, text FROM {{docs}}
    ),
    toks AS (
      SELECT doc_id, ws FROM (
        SELECT doc_id, split(trim(text), '\\\\s+') AS ws FROM src
      ) WHERE size(ws) >= 3
    ),
    sh0 AS (
      SELECT DISTINCT doc_id,
             xxhash64(element_at(ws, p), element_at(ws, p + 1),
                      element_at(ws, p + 2)) AS h
      FROM (SELECT doc_id, ws,
                   explode(sequence(1, size(ws) - 2)) AS p FROM toks)
    ),
    keep AS (
      SELECT h FROM sh0 GROUP BY h HAVING count(1) <= {_MAX_SHINGLE_DF}
    ),
    sh AS (
      SELECT /*+ SHUFFLE_HASH(k) */ sh0.doc_id, sh0.h
      FROM sh0 JOIN keep k ON sh0.h = k.h
    ),
    cnt AS (SELECT doc_id, count(1) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT /*+ SHUFFLE_HASH(b) */
             a.doc_id AS doc_a, b.doc_id AS doc_b, count(1) AS c
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT /*+ BROADCAST(ca), BROADCAST(cb) */
           doc_a, doc_b,
           round(c * 1.0D / (ca.n + cb.n - c), 6) AS jaccard
    FROM inter
    JOIN cnt ca ON doc_a = ca.doc_id
    JOIN cnt cb ON doc_b = cb.doc_id
    WHERE c * 1.0D / (ca.n + cb.n - c) >= 0.2
    """,
        docs=d,
    )


EXPERIMENTS = {
    "d02": [
        ("baseline", None),  # None -> registry fn
        ("variant_b_2nd_exchange", d02_variant_b),
        ("variant_agg_cap", d02_variant_agg),
    ],
}


def parity(df_a, df_b) -> bool:
    cols = sorted(df_a.columns)
    a = sorted(map(tuple, df_a.select(*cols).collect()))
    b = sorted(map(tuple, df_b.select(*cols).collect()))
    return a == b


def main() -> None:
    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    qname = {"d02": "d02_ngram_jaccard"}[exp]
    specs = load_all()
    spark = get_spark("opt-lab-r15")
    bench.tune_for_input(spark, SF_DIR)
    base_fn = specs[qname].fn
    variants = [
        (n, fn if fn is not None else base_fn) for n, fn in EXPERIMENTS[exp]
    ]

    # parity check first (against the baseline), at the lab SF — a variant
    # that fails is actually REMOVED from the timing loop (its numbers must
    # never appear next to the baseline's as if they were a valid win)
    base_df = base_fn(spark, SF_DIR)
    passing = [variants[0]]
    for n, fn in variants[1:]:
        ok = parity(base_df, fn(spark, SF_DIR))
        print(f"parity {n}: {ok}", flush=True)
        if ok:
            passing.append((n, fn))
        else:
            print(f"PARITY FAILURE — {n} dropped from timing", flush=True)
    variants = passing

    # warmup each variant once
    for _, fn in variants:
        fn(spark, SF_DIR).count()

    best: dict[str, float] = {}
    for rep in range(reps):
        for n, fn in variants:
            spark.catalog.clearCache()
            cagg = bench._prepared_exec(fn(spark, SF_DIR))
            t0 = time.perf_counter()
            cagg.collect()
            dt = time.perf_counter() - t0
            best[n] = min(best.get(n, 9e9), dt)
    for n, v in best.items():
        print(f"{n}: {v:.3f}s")


if __name__ == "__main__":
    main()
