"""Similarity search over the embeddings table (array<float> column).

* brute-force cosine top-k — the exact baseline: query set x candidate set
  dot products via JVM higher-order functions (zip_with + aggregate), rank
  per query. At scale: broadcast the (small) query set, scan candidates once;
  cost is |queries| x |candidates| fused multiply-adds inside codegen, no
  shuffle except the final per-query top-k (WindowGroupLimit keeps k rows
  per partition).
* IVF-bucketed ANN — the scale path: assign every vector to its nearest of C
  centroids (broadcast centroids, one scan), then probe only the query's
  centroid bucket. Bucket assignment is a shuffle on centroid_id; probe cost
  drops by ~C vs brute force.

Cosines are computed in double and rounded to 9 dp on both engines so the
oracle hash is float-drift-proof.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ducktales_spark.data import table
from ducktales_spark.registry import register

_N_QUERIES = 5
_TOP_K = 10
_N_CENTROIDS = 16


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


@register(
    "e01_cosine_topk",
    survey_ids=("J1", "W1"),  # extension: brute-force cosine top-k
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
    """Brute-force cosine top-{k} for the first {n} vectors as queries."""
    v = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    q = (
        v.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    )
    sims = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("e")), 9).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        sims.select("*", F.row_number().over(w).cast("bigint").alias("rnk"))
        .filter(F.col("rnk") <= _TOP_K)
        .orderBy("query_id", "rnk")
    )


@register(
    "e02_ivf_ann",
    survey_ids=(),  # extension: IVF approximate NN (rows-only; recall vs
    # brute force asserted in tests/test_similarity.py)
    oracle=None,
)
def e02_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: nearest-centroid bucketing, probe one
    bucket. Centroids are the first C vectors (deterministic; a k-means loop
    would refine them — same plumbing)."""
    v = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    cent = v.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )
    # assign every vector to its nearest centroid (broadcast C rows, one scan)
    wa = W.partitionBy("vec_id").orderBy(
        F.col("c_sim").desc(), F.col("centroid_id")
    )
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "e",
            "centroid_id",
            cosine(F.col("e"), F.col("ce")).alias("c_sim"),
        )
        .withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .drop("rn", "c_sim")
    )
    q = (
        assigned.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("centroid_id").alias("q_centroid"),
        )
    )
    # probe: candidates in the query's bucket only
    sims = (
        assigned.join(
            F.broadcast(q), F.col("centroid_id") == F.col("q_centroid")
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("e")), 9).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        sims.select("*", F.row_number().over(w).cast("bigint").alias("rnk"))
        .filter(F.col("rnk") <= _TOP_K)
        .orderBy("query_id", "rnk")
    )


@register(
    "e03_embedding_neardup",
    survey_ids=(),  # extension: embedding-cosine near-dup pairs (rows-only)
    oracle=None,
)
def e03_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= 0.95) searched within IVF
    buckets — same-bucket join instead of |V|^2 cross product."""
    v = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    cent = v.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )
    wa = W.partitionBy("vec_id").orderBy(F.col("c_sim").desc(), F.col("centroid_id"))
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "e", "centroid_id", cosine(F.col("e"), F.col("ce")).alias("c_sim")
        )
        .withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .drop("rn", "c_sim")
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    sim = F.round(cosine(F.col("a.e"), F.col("b.e")), 9)
    return (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.95)
        .orderBy("vec_a", "vec_b")
    )
