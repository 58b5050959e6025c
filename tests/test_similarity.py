"""Similarity-search quality tests: IVF recall against the exact brute-force
top-k, and near-dup detection on planted duplicate vectors (both rows-only
for the driver's oracle — this is their correctness gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ducktales_spark.queries.similarity import (
    e01_cosine_topk,
    e02_ivf_ann,
    e03_embedding_neardup,
)

SF = "/root/testdata/sf0.001"


def _topk_sets(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_brute_force(spark):
    """The IVF probe searches 1/C of the space; within the probed bucket its
    results must be a subset of brute force ordering-wise, and overall recall
    of the true top-10 should be non-trivial (same-bucket neighbors)."""
    exact = _topk_sets(e01_cosine_topk(spark, SF).collect())
    approx = _topk_sets(e02_ivf_ann(spark, SF).collect())
    assert set(approx).issubset(set(exact)) or set(approx) == set(exact)
    recalls = []
    for q, nbrs in approx.items():
        recalls.append(len(nbrs & exact[q]) / len(exact[q]))
    assert sum(recalls) / len(recalls) >= 0.3  # one-bucket probe lower bound
    # every approx result must cite a genuinely high-cosine neighbor:
    # approx sims are a subset of the exact sim table by construction
    ex_rows = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in e01_cosine_topk(spark, SF).collect()
    }
    for r in e02_ivf_ann(spark, SF).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in ex_rows:
            assert r["cos_sim"] == pytest.approx(ex_rows[key], abs=1e-9)


def test_neardup_finds_planted_duplicates(spark):
    """Append exact copies of two vectors with new ids; the near-dup query
    must report them at cosine 1.0."""
    from ducktales_spark.data import table
    from ducktales_spark.queries.similarity import (
        _N_CENTROIDS,
        _np,
        as_double,
        assign_buckets,
    )
    import numpy as np
    import pandas as pd

    v = table(spark, SF, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    pdf = v.filter(F.col("vec_id").isin([100, 101])).toPandas()
    clones = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": pdf["vec_id"] + 100000, "e": pdf["e"]}
        ),
        "vec_id bigint, e array<double>",
    )
    allv = v.unionByName(clones)
    assigned = assign_buckets(allv, _N_CENTROIDS)

    # clones land in the same bucket as their originals (same vector)
    buckets = {
        r["vec_id"]: r["centroid_id"]
        for r in assigned.filter(
            F.col("vec_id").isin([100, 101, 100100, 100101])
        ).collect()
    }
    assert buckets[100] == buckets[100100]
    assert buckets[101] == buckets[100101]

    # and the near-dup operator over the cloned set surfaces them at cos 1.0
    from ducktales_spark.queries.similarity import neardup_pairs

    pairs = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in neardup_pairs(allv).collect()
    }
    assert pairs.get((100, 100100)) == pytest.approx(1.0)
    assert pairs.get((101, 100101)) == pytest.approx(1.0)
    assert all(c >= 0.95 for c in pairs.values())
    # the standard corpus query still runs and respects the threshold
    std = e03_embedding_neardup(spark, SF).collect()
    assert all(r["cos_sim"] >= 0.95 for r in std)


def test_neardup_skewed_bucket_blocked_gram(spark):
    """VERDICT r1 (e03 scale hardening): one bucket ~10x the mean must not
    blow memory — the gram matrix is tiled at `block` granularity. Run with
    a tiny block (7) so a 60-vector skewed bucket spans many tiles, and
    check pairs are found across tile boundaries with no duplicates."""
    import numpy as np
    import pandas as pd
    from ducktales_spark.queries.similarity import neardup_pairs

    rng = np.random.default_rng(3)
    dim = 16
    rows = []
    # ids 0-7 become the centroids (first C vectors). Centroid 0 anchors the
    # skewed cluster; 1-7 are independent random directions.
    base = rng.normal(size=dim)
    base /= np.linalg.norm(base)
    rows.append((0, [float(x) for x in base]))
    for i in range(1, 8):
        rows.append((i, [float(x) for x in rng.normal(size=dim)]))
    # skewed cluster: 59 tiny perturbations of centroid 0's direction ->
    # ONE bucket holds 60 vectors (~10x the 90/8 mean), pairwise cosine ~1
    cluster = [0] + list(range(8, 67))
    for i in range(8, 67):
        v = base + rng.normal(scale=1e-4, size=dim)
        rows.append((i, [float(x) for x in v]))
    # background: random vectors, no near-dups at 0.95 in 16-d
    for i in range(67, 90):
        rows.append((i, [float(x) for x in rng.normal(size=dim)]))
    df = spark.createDataFrame(rows, "vec_id bigint, e array<double>")
    got = neardup_pairs(df, n_centroids=8, threshold=0.95, block=7).collect()
    pairs = [(r["vec_a"], r["vec_b"]) for r in got]
    assert len(pairs) == len(set(pairs))  # no tile-boundary duplicates
    expected = {
        (a, b) for a in cluster for b in cluster if a < b
    }
    assert set(pairs) == expected  # every skewed-cluster pair, nothing else


def test_e02_oracle_parity_random_embeddings(spark, tmp_path):
    """Cross-engine parity on a synthetic corpus beyond the driver's data:
    random vectors plus planted exact duplicates (cos 1.0 -> neardup rows)
    and a vector colliding with a centroid. Runs the REGISTERED query and
    its oracle verbatim against a temp sf-dir, exercising the 9-dp-rounded
    assignment/probe/rank decisions end to end."""
    import duckdb
    import numpy as np

    from ducktales_spark.registry import load_all
    from tests.oracle import compare

    rng = np.random.default_rng(20260814)
    n, dim = 48, 8
    V = rng.normal(size=(n, dim)).astype(np.float32)
    V[37] = V[5]            # exact duplicate pair (5, 37)
    V[41] = V[2] * 1.001    # same direction as centroid 2 -> cos ~1.0
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    sdf = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    sf_dir = str(tmp_path)
    sdf.coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/embeddings.parquet"
    )

    spec = load_all()["e02_ivf_family"]
    con = duckdb.connect()
    con.execute(  # Spark wrote a parquet DIRECTORY -> glob its part files
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet/*.parquet'"
    )
    mism = compare(spec.fn(spark, sf_dir), con, spec.oracle)
    assert not mism, mism[:5]
    # the planted duplicates must surface as neardup rows on the Spark side
    got = spec.fn(spark, sf_dir).collect()
    nd_pairs = {(r["id_a"], r["id_b"]) for r in got if r["kind"] == "neardup"}
    assert (5, 37) in nd_pairs


def test_assign_buckets_distributed_matches_broadcast(spark):
    """The cogroup (driver-free) assignment kernel must agree with the
    broadcast kernel vector for vector — same 9-dp rounding, same
    ties-to-lowest-centroid rule — regardless of partition count."""
    from ducktales_spark.data import table
    from ducktales_spark.queries.similarity import (
        _N_CENTROIDS,
        as_double,
        assign_buckets,
        assign_buckets_distributed,
        _centroids,
    )

    v = table(spark, SF, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    cpdf = _centroids(v, _N_CENTROIDS)
    want = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_buckets(v, _N_CENTROIDS, centroids=cpdf).collect()
    }
    cdf = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.e]) for r in cpdf.itertuples()],
        "vec_id bigint, e array<double>",
    )
    for p in (1, 3, 8):
        got = {
            r["vec_id"]: r["centroid_id"]
            for r in assign_buckets_distributed(
                v, cdf, n_partitions=p
            ).collect()
        }
        assert got == want, f"n_partitions={p}"
