"""Similarity search over the embeddings table (array<float> column).

* brute-force cosine top-k — the exact baseline: the (small) query set is
  collected + broadcast, candidates stream through an Arrow-batched
  ``mapInPandas`` that computes a per-batch numpy matmul (E @ Q^T). One scan,
  no join, no pair materialization; the only shuffle is the final per-query
  top-k window. This is the documented Spark fast path for vector math —
  a higher-order-function (zip_with/aggregate) formulation is evaluated
  interpreted by Catalyst and ran ~10x slower.
* IVF-bucketed ANN — the scale path: assign every vector to its nearest of C
  centroids (broadcast centroids, argmax inside the same batch kernel), then
  probe only the query's centroid bucket. Probe cost drops ~C vs brute force.
* embedding near-dup — pairwise cosine >= 0.95 searched within IVF buckets
  via ``applyInPandas``: each bucket computes one gram matrix; vectors ship
  through the shuffle once, pairs never materialize outside numpy.

Cosines are computed in float64 and rounded to 9 dp on both engines so the
oracle hash is float-drift-proof.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ducktales_spark.data import table
from ducktales_spark.registry import register

_N_QUERIES = 5
_TOP_K = 10
_N_CENTROIDS = 16


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )


def _np(pdf_col) -> np.ndarray:
    return np.array(pdf_col.tolist(), dtype=np.float64)


def cosine_scores(
    candidates: DataFrame, query_ids: np.ndarray, Q: np.ndarray
) -> DataFrame:
    """(vec_id, e) x broadcast query matrix -> (query_id, neighbor_id,
    cos_sim) rows, numpy-matmul per Arrow batch. Self-pairs dropped."""
    sc = candidates.sparkSession.sparkContext
    bc = sc.broadcast((query_ids, Q, np.linalg.norm(Q, axis=1)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, Qm, Qn = bc.value
        nq = len(qids)
        for pdf in batches:
            if not len(pdf):
                continue
            E = _np(pdf["e"])
            vids = pdf["vec_id"].to_numpy()
            S = (E @ Qm.T) / (
                np.linalg.norm(E, axis=1)[:, None] * Qn[None, :]
            )
            out = pd.DataFrame(
                {
                    "query_id": np.tile(qids, len(vids)),
                    "neighbor_id": np.repeat(vids, nq),
                    "cos_sim": np.round(S, 9).ravel(),
                }
            )
            yield out[out["query_id"] != out["neighbor_id"]]

    return candidates.mapInPandas(
        run, "query_id bigint, neighbor_id bigint, cos_sim double"
    )


def _topk(sims: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.select("*", F.row_number().over(w).cast("bigint").alias("rnk"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


@register(
    "e01_cosine_topk",
    survey_ids=("J1", "W1", "S6"),  # extension: brute-force cosine top-k;
    # S6: query vectors arrive via the Arrow toPandas result path
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {_N_QUERIES}),
    sims AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             round(list_dot_product(q.qe, v.e)
                   / (sqrt(list_dot_product(q.qe, q.qe))
                      * sqrt(list_dot_product(v.e, v.e))), 9) AS cos_sim
      FROM q, v
      WHERE v.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM sims
    )
    WHERE rnk <= {_TOP_K}
    ORDER BY query_id, rnk
    """,
)
def e01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the first N vectors as queries. The query
    set must be driver-small (it is broadcast); the candidate side streams —
    at 100 TB this is one scan with no shuffle before the top-k."""
    v = _vectors(spark, sf_dir)
    qpdf = v.filter(F.col("vec_id") < _N_QUERIES).toPandas()
    sims = cosine_scores(v, qpdf["vec_id"].to_numpy(), _np(qpdf["e"]))
    return _topk(sims, _TOP_K)


def assign_buckets(v: DataFrame, n_centroids: int) -> DataFrame:
    """IVF bucket assignment: nearest (max-cosine) centroid per vector, ties
    to the lowest centroid id. Centroids are the first C vectors
    (deterministic; a k-means loop would refine them — same plumbing)."""
    cpdf = v.filter(F.col("vec_id") < n_centroids).orderBy("vec_id").toPandas()
    cids = cpdf["vec_id"].to_numpy()
    C = _np(cpdf["e"])
    bc = v.sparkSession.sparkContext.broadcast(
        (cids, C, np.linalg.norm(C, axis=1))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cids, Cm, Cn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            E = _np(pdf["e"])
            S = (E @ Cm.T) / (np.linalg.norm(E, axis=1)[:, None] * Cn[None, :])
            best = cids[np.argmax(S, axis=1)]  # argmax -> first max -> low id
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "e": pdf["e"],
                    "centroid_id": best,
                }
            )

    return v.mapInPandas(
        run, "vec_id bigint, e array<double>, centroid_id bigint"
    )


@register(
    "e02_ivf_ann",
    survey_ids=(),  # extension: IVF approximate NN (rows-only; recall vs
    # brute force asserted in tests/test_similarity.py)
    oracle=None,
)
def e02_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: nearest-centroid bucketing, probe one
    bucket (the query's own). Queries are grouped by bucket in a broadcast
    lookup; each candidate batch scores only against the queries of its own
    bucket — no join, one candidate scan, probe cost ~1/C of brute force."""
    assigned = assign_buckets(_vectors(spark, sf_dir), _N_CENTROIDS)
    qpdf = assigned.filter(F.col("vec_id") < _N_QUERIES).toPandas()
    probe_buckets = sorted(set(qpdf["centroid_id"]))
    lookup = {
        cid: (
            grp["vec_id"].to_numpy(),
            _np(grp["e"]),
            np.linalg.norm(_np(grp["e"]), axis=1),
        )
        for cid, grp in qpdf.groupby("centroid_id")
    }
    bc = spark.sparkContext.broadcast(lookup)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lk = bc.value
        for pdf in batches:
            for cid, grp in pdf.groupby("centroid_id"):
                if cid not in lk:
                    continue
                qids, Qm, Qn = lk[cid]
                E = _np(grp["e"])
                vids = grp["vec_id"].to_numpy()
                S = (E @ Qm.T) / (
                    np.linalg.norm(E, axis=1)[:, None] * Qn[None, :]
                )
                out = pd.DataFrame(
                    {
                        "query_id": np.tile(qids, len(vids)),
                        "neighbor_id": np.repeat(vids, len(qids)),
                        "cos_sim": np.round(S, 9).ravel(),
                    }
                )
                yield out[out["query_id"] != out["neighbor_id"]]

    sims = assigned.filter(
        F.col("centroid_id").isin(probe_buckets)  # partition-prunable scan cut
    ).mapInPandas(run, "query_id bigint, neighbor_id bigint, cos_sim double")
    return _topk(sims, _TOP_K)


def neardup_pairs(
    v: DataFrame, n_centroids: int = _N_CENTROIDS, threshold: float = 0.95
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) searched within IVF
    buckets: applyInPandas computes one gram matrix per bucket — vectors
    cross the shuffle once; the |bucket|^2 pair space exists only inside
    numpy, never as Spark rows."""
    assigned = assign_buckets(v, n_centroids)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        E = _np(pdf["e"])
        vids = pdf["vec_id"].to_numpy()
        order = np.argsort(vids)
        E, vids = E[order], vids[order]
        norm = np.linalg.norm(E, axis=1)
        S = (E @ E.T) / (norm[:, None] * norm[None, :])
        iu = np.triu_indices(len(vids), k=1)
        sims = np.round(S[iu], 9)
        keep = sims >= threshold
        return pd.DataFrame(
            {
                "vec_a": vids[iu[0][keep]],
                "vec_b": vids[iu[1][keep]],
                "cos_sim": sims[keep],
            }
        )

    return (
        assigned.groupBy("centroid_id")
        .applyInPandas(
            bucket_pairs, "vec_a bigint, vec_b bigint, cos_sim double"
        )
        .orderBy("vec_a", "vec_b")
    )


@register(
    "e03_embedding_neardup",
    survey_ids=(),  # extension: embedding-cosine near-dup pairs (rows-only)
    oracle=None,
)
def e03_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs over the embeddings table (see
    neardup_pairs for the bucketed gram-matrix design)."""
    return neardup_pairs(_vectors(spark, sf_dir))
