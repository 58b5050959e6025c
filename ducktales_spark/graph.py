"""Distributed connected components — the transitive-closure step a
near-dup pipeline needs between "similar pairs" and "one survivor per
duplicate cluster".

The pairwise dedup operators (queries.dedup, streaming.dedup) emit edges:
(doc_a, doc_b) with similarity over threshold. Greedy drop-the-higher-id
handles the common case but over-drops on chains (A~B, B~C, A≁C keeps
only A even though C's sole similar doc B is itself dropped) and cannot
answer "which cluster did this doc belong to" for audit. The correct
semantics is one canonical survivor per CONNECTED COMPONENT of the
similarity graph.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC 2014). Each round is two groupBy-min + join stages over the
edge list; converges in O(log^2 n) rounds on any graph (near-dup graphs —
star-ish clusters of bounded diameter — converge in 2-3). This is the
published scale algorithm: label propagation needs diameter rounds and a
full label table join per round; large/small-star strictly shrinks edges
toward stars and touches only the edge list.

Scale posture per round: edges are (long, long) pairs; every stage is a
codegen groupBy/join on node id (uniform after the first round because
high-degree stars collapse onto their minimum). Lineage is truncated every
round with localCheckpoint — on a real cluster point
spark.sparkContext.setCheckpointDir at durable storage and swap in
.checkpoint() for driver-failure tolerance; the algorithm is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(N(u) ∪ {u}); connect strictly larger
    neighbors to m. Input/output: undirected edge list (u, v), u != v."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", "u").alias("m")
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct each edge high->low; for each center u: m = min(smaller
    neighborhood ∪ {u}); connect u and its smaller neighbors to m."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = directed.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = directed.join(m, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    centers = m.select(F.col("u"), F.col("m").alias("v"))
    return (
        nbrs.unionByName(centers)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns (node, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id in that node's component — a
    deterministic canonical label. Node ids must be orderable (use int64;
    hash string ids first). Self-loops carry no connectivity: a node whose
    only edges are self-loops is emitted as its own singleton component.

    Converges when a large-star + small-star round leaves the edge set
    unchanged (at that point the edge list IS the star node->component,
    minus each component's root); raises if ``max_rounds`` is exhausted —
    at the paper's O(log^2 n) bound, 50 rounds covers any realistic graph.
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    cur = (
        raw.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        # converged iff the edge set is unchanged: compare symmetric
        # difference (one aggregate each way; both sides are checkpointed)
        changed = (
            nxt.exceptAll(cur).limit(1).count()
            or cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    labeled = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    # roots + self-loop-only nodes: every edge endpoint not appearing as a
    # star leaf labels itself (the root's label IS its own id; a node with
    # only self-loops never entered the star rounds at all)
    # SHUFFLE_HASH: the anti probe needs no order and `labeled` (the
    # converged star edges) arrives from a checkpointed shuffle — SMJ would
    # sort both sides for nothing (guide §3.1; same rationale as the dedup
    # band joins). Build side = labeled rows per partition, bounded by the
    # deployment's shuffle-partition sizing like every hinted SHJ here.
    singletons = (
        all_nodes.join(labeled.hint("shuffle_hash"), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    return labeled.unionByName(singletons).distinct()


def dedup_components(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple = ("doc_a", "doc_b"),
) -> DataFrame:
    """Cluster near-dup PAIRS into components and assign every document its
    canonical survivor: (id_col, canonical_id, is_survivor).

    Docs in no pair are their own singleton cluster (left join, no edge
    traffic for them). Survivor = minimum id per component — determinism
    matches the greedy pipelines, but chains now collapse to ONE cluster
    with one survivor instead of over-dropping every chained doc.

    ``pairs`` may reference ids absent from ``docs`` (e.g. docs already
    removed upstream): the canonical id is recomputed as the minimum id
    among PRESENT members of each component, so every cluster with at
    least one present doc keeps exactly one present survivor. (When pairs
    is a subset of docs — the normal case — this is identical to the raw
    component label; the recompute is a groupBy over the matched subset
    only, O(|pair nodes|), not over the corpus.)
    """
    comp = connected_components(pairs, src=pair_cols[0], dst=pair_cols[1])
    matched = docs.select(id_col).join(
        comp, F.col(id_col) == comp["node"]
    ).select(id_col, "component")
    canon = matched.groupBy("component").agg(
        F.min(id_col).alias("canonical_id")
    )
    # SHUFFLE_HASH on the aggregated/label sides: canon is one row per
    # component and comp one per paired node — both already hash-distributed
    # by their producing aggregations, and neither consumer uses order, so
    # the default SortMergeJoin's two sorts are pure waste (r15 interleaved
    # A/B, g01 at sf0.1 min-of-7, two runs: 0.474 -> 0.417 s and
    # 0.417 -> 0.385 s with these three hints).
    matched_out = matched.join(
        canon.hint("shuffle_hash"), "component"
    ).select(id_col, "canonical_id")
    singles = (
        docs.select(id_col)
        .join(
            comp.hint("shuffle_hash"),
            F.col(id_col) == comp["node"],
            "left_anti",
        )
        .select(id_col, F.col(id_col).alias("canonical_id"))
    )
    return matched_out.unionByName(singles).withColumn(
        "is_survivor", F.col(id_col) == F.col("canonical_id")
    )
