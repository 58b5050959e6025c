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


def _star_round(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """One large-star + small-star round, window-formulated.

    Set-identical to the textbook groupBy-min + join formulation (r15 shape)
    round for round, but the physical plan is 3 exchanges and ZERO joins
    instead of 11 exchanges + 4 SortMergeJoins (r16 measured; the join
    build recomputed the large-star subtree on every reference because
    filter pushdown and distinct-elimination de-canonicalized the
    otherwise-shared exchanges — guide §2.4's "check explain() for
    Exchange nodes you did not expect"):

    * large star: m = min(N(u) ∪ {u}) per node via ``min(v) OVER
      (PARTITION BY u)`` — the per-group min rides the ONE hash(u)
      exchange instead of a groupBy + re-join; strictly larger neighbors
      connect to m.
    * the inter-star ``distinct()`` is dropped: small-star's min is
      multiset-invariant and the final distinct collapses duplicate
      emissions map-side, so the extra (u, v) exchange bought nothing.
    * small star: large-star output rows already satisfy u > v (they are
      (v_old, m) with m <= u_old < v_old), so the greatest/least
      re-direction is the identity and is skipped; the per-center min is
      again a window over the hash(u) exchange, and each row emits BOTH
      its neighbor edge (v, m) and its center edge (u, m) through one
      explode — duplicate center emissions (one per edge row instead of
      one per center) are collapsed by the final distinct's partial
      aggregate before they reach the wire.

    Input: undirected edge list (u, v) with u != v. Output: the next
    round's edge set — canonical (distinct, self-loop-free) when ``dedup``
    is True. ``dedup=False`` skips the trailing ``distinct()`` and emits a
    MULTISET with the same underlying set: every consumer inside the
    convergence loop is multiset-invariant (window mins, per-row filters,
    per-row emissions), so the INTERMEDIATE round of a fused round pair
    can drop its dedup exchange entirely — duplicates (bounded at <= 2x
    the input rows: |ls| = |edges| and the explode doubles it) ride one
    extra round of windows instead of paying a full (u, v) exchange.
    Only the pair's final round dedups (r16 fused-loop A/B below).
    """
    from pyspark.sql import Window as W

    wu = W.partitionBy("u")
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    ls = (
        sym.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    sm = ls.withColumn("m", F.min("v").over(wu))
    out = (
        sm.select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                    F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .filter(F.col("u") != F.col("v"))
    )
    return out.distinct() if dedup else out


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
    for _ in range((max_rounds + 1) // 2):  # each iteration = 2 rounds
        # TWO star rounds per Spark job (r16 fused loop): at every SF the
        # per-round job is dominated by fixed job overhead (DAG submission
        # + scheduling of a 3-exchange job), so round k+1 is computed
        # directly on round k's not-yet-materialized output inside the
        # SAME job. The intermediate round skips its dedup (multiset-safe,
        # see _star_round); both rounds' checkpoints are LAZY and are
        # materialized as a side effect of the convergence count — one
        # Spark job per PAIR does 2x round-compute + truncation +
        # convergence test. Interleaved min-of-N A/B vs the single-round
        # loop, parity true at every SF: g01 build 1.66 -> 1.26 s at
        # sf0.1, 1.99 -> 1.57 s at sf1, 5.70 -> 3.63 s at sf10 (and the
        # job count per build drops 10 -> 8 at 4 rounds).
        mid = _star_round(cur, dedup=False).localCheckpoint(eager=False)
        nxt = _star_round(mid).localCheckpoint(eager=False)
        # Converged iff set(mid) == set(nxt) — i.e. one application of
        # _star_round left the edge set unchanged, the exact original
        # criterion, tested one round EARLIER than comparing cur vs nxt.
        # mid is a multiset, so the one-aggregate set-equality test checks
        # presence-of-both-tags per (u, v) via min/max (a tag-SUM would
        # break on duplicate mid rows).
        changed = (
            mid.select("u", "v", F.lit(1).alias("__t"))
            .unionByName(nxt.select("u", "v", F.lit(2).alias("__t")))
            .groupBy("u", "v")
            .agg(F.min("__t").alias("__lo"), F.max("__t").alias("__hi"))
            .filter((F.col("__lo") != 1) | (F.col("__hi") != 2))
            .limit(1)
            .count()
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
