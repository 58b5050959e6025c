"""Persistent-vector-index registry query: build an IVF index as lake
tables, probe it, and verify the full round trip against a DuckDB oracle
that recomputes the same deterministic bucketing + probe relationally.

This is the driver-correctness face of ``ducktales_spark.vector_index``
(build -> clustered lake write -> catalog file pruning -> probe): the
oracle is the e02 ANN SQL restricted to the probed buckets, valid because
every ranking decision on both engines happens on the same 9-dp-rounded
cosine with ties to the lowest id.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from ducktales_spark.data import stats_num_rows
from ducktales_spark.queries.similarity import (
    _N_CENTROIDS,
    _N_PROBE,
    _N_QUERIES,
    _TOP_K,
    _query_vectors,
    _vectors,
    n_centroids_for,
)
from ducktales_spark.registry import register


def _cos(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b}))), 9)"
    )


@register(
    "v01_vector_index_probe",
    survey_ids=(),  # extension: persistent IVF vector index (build + probe)
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    params AS (
      SELECT GREATEST({_N_CENTROIDS},
                      CAST(floor(sqrt(count(*))) AS BIGINT)) AS C
      FROM v
    ),
    cent AS MATERIALIZED (
      SELECT vec_id AS cid, e AS ce FROM v
      WHERE vec_id < (SELECT C FROM params)
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, e, cid AS centroid_id
      FROM (
        SELECT v.vec_id, v.e, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_cos("v.e", "c.ce")} DESC, c.cid) AS rn
        FROM v, cent c
      )
      WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {_N_QUERIES}
    ),
    qprobe AS (
      SELECT query_id, qe, cid
      FROM (
        SELECT q.query_id, q.qe, c.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_cos("q.qe", "c.ce")} DESC, c.cid) AS rn
        FROM q, cent c
      )
      WHERE rn <= {_N_PROBE}
    ),
    sims AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {_cos("p.qe", "a.e")} AS cos_sim
      FROM qprobe p JOIN assign a ON a.centroid_id = p.cid
      WHERE a.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM sims
    )
    WHERE rnk <= {_TOP_K}
    ORDER BY query_id, rnk
    """,
)
def v01_vector_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the persistent IVF index (two lake tables in one transaction,
    data clustered by centroid_id so probes FILE-prune), then probe it with
    the first N vectors as queries. Exercises: stats-sourced C (parquet
    footer, no count job), the clustered lake write, the distributed
    centroid-ranking probe path (no C x dim driver collect), catalog file
    pruning via the centroid_id predicate, and the local-top-k kernel."""
    from ducktales_spark.lake import connect
    from ducktales_spark.vector_index import (
        build_vector_index,
        probe_vector_index,
    )

    v = _vectors(spark, sf_dir)
    C = n_centroids_for(v, n=stats_num_rows(sf_dir, "embeddings"))
    lake = connect(
        "lake:" + tempfile.mkdtemp(prefix="ducktales_vidx_"), spark
    )
    build_vector_index(lake, "vidx", v, n_centroids=C)
    # same 5 query rows e01 collects — the per-(session, sf_dir) memo
    # (similarity._query_vectors) shares the collect job. e01 caches the
    # raw float32 embeddings while v is the double cast; both widen
    # exactly to the same float64 matrix inside the numpy kernel, so the
    # probe is value-identical whichever query seeded the memo.
    queries = _query_vectors(spark, sf_dir, v)
    return probe_vector_index(lake, "vidx", queries)
