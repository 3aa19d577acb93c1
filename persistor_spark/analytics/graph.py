"""Iterative graph algorithms over DataFrames: PageRank.

Complements the connected-components family in `dedup.py` (label
propagation, two-phase large/small-star) with the other canonical
iterative-join shape a data-curation pipeline needs — source/entity
importance ranking over an interaction graph (e.g. rank crawl domains by
link structure before sampling, weight entities by co-occurrence).

Scale shape: each PageRank iteration is ONE shuffle join (edges x ranks on
src) + ONE aggregation (sum of contributions by dst).  The edge table with
pre-joined out-degrees is computed once and cached, so the per-iteration
cost is the join itself; ranks are localCheckpoint-ed per round to keep the
lineage flat (the same discipline as the CC loops, dedup.py:549-691).  At
cluster scale, pre-bucketing edges by src makes the per-iteration join
shuffle-free on the edge side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bipartite_interaction_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Symmetric customer<->supplier interaction edges: one edge per DISTINCT
    (customer, supplier) purchase relationship, emitted in both directions so
    the graph is undirected (no dangling nodes — every node has out-degree)."""
    # distinct on the integer keys FIRST — the dedup shuffle moves two ints
    # per row, not formatted strings; node ids are built narrow afterwards
    pairs = (
        orders.select("o_orderkey", "o_custkey")
        .join(lineitem.select("l_orderkey", "l_suppkey"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
    )
    # both directions via ONE explode instead of unionAll of two selects:
    # Spark does not CSE union branches, so the unionAll plan evaluated the
    # whole join+distinct subtree TWICE (measured: the edge materialization
    # was the dominant pagerank phase).  Same edge multiset, one pass
    # (r14 opt, guide §2.4).
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a symmetric edge list (src, dst).

    r_{k+1}(v) = (1-d)/N + d * sum_{u->v} r_k(u) / outdeg(u), r_0 = 1/N.

    Returns (node, rank) for EVERY node, rank rounded to 6 decimals,
    ordered by node — the stable full-ranking output (top-k is a cheap
    TakeOrdered over it when needed).  Requires a symmetric graph so the
    dangling-mass term vanishes (bipartite_interaction_edges guarantees it).

    ``broadcast_ranks`` (default) broadcasts the rank table into the
    per-iteration join: ranks hold ONE row per node, so while edges may be
    100 TB the rank side is node-count-bounded, and broadcasting it means
    the big edge table never re-shuffles — each round is a map-side join +
    one agg shuffle keyed by dst.  For graphs whose node set outgrows the
    broadcast budget, pass False and pre-partition the edge input by src so
    the sort-merge join co-locates instead.

    Single-action expectation: below the 4-round checkpoint cadence the
    returned frame is a LAZY recurrence — each action re-executes every
    un-checkpointed round (values stay deterministic).  Callers that plan
    multiple actions over the result should localCheckpoint()/persist() it
    themselves first.
    """
    # materialize the edge list ONCE (upstream may be an expensive join +
    # distinct); everything after re-reads these blocks, not the lineage
    edges = edges.select("src", "dst").localCheckpoint()
    # per-node degree: slim one-column shuffle with map-side combine; tiny
    # result (one row per node) — cache it, it seeds ranks AND the edge join
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    n = deg.count()
    # degree-annotated edges: broadcast the node-bounded deg table so the
    # big edge side never shuffles for this glue join
    e = edges.join(F.broadcast(deg), "src").select("src", "dst", "deg")
    base = (1.0 - damping) / n
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        ranks = (
            e.join(r, e.src == r.node)
            .groupBy("dst")
            .agg((F.lit(base) + F.lit(damping) * F.sum(F.col("rank") / F.col("deg"))).alias("rank"))
            .select(F.col("dst").alias("node"), "rank")
        )
        # Checkpoint every FOURTH round, not every round (r14 opt, guide
        # §1.2): each localCheckpoint is a blocking driver job, and for
        # the default 3 iterations the whole recurrence can stay lazy and
        # evaluate inside the final action (the per-round broadcast builds
        # from the nested agg subtree; sums are bit-identical because the
        # edge side's partitioning — what partial-agg order derives from —
        # is the same checkpointed blocks either way).  The periodic
        # checkpoint keeps many-iteration calls from growing an
        # analysis-budget-busting plan, the same flat-plan motivation the
        # per-round checkpoint had.
        if (i + 1) % 4 == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank")).orderBy("node")


def bfs_distances(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 3
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed node, bounded
    by `max_depth` — the reachability/impact query (which suppliers sit
    within k hops of these customers) over the same symmetric edge list
    PageRank and CC use.

    Iterative-join shape: each round expands only the NEW frontier
    (anti-joined against visited), so per-round volume is frontier x
    average degree — never the whole reach set re-expanded, and rounds are
    bounded by `max_depth`, not graph diameter.  The visited set is
    localCheckpoint-ed per round (the CC fixpoint pattern: the plan stays
    flat instead of growing one join per round).  Returns (node, dist),
    dist in [0, max_depth]; unreached nodes are absent.

    `seeds` is a 1-column (node) DataFrame.  Distances are exact BFS
    minima: a node first reached in round i has dist i, and later longer
    paths can't lower it, so no final min-aggregation is needed.
    """
    # the edge list is probed every round — materialize it once instead of
    # re-deriving it (for the purchase graph that derivation is a
    # join+distinct over orders x lineitem) per depth
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    visited = seeds.select(
        F.col(seeds.columns[0]).alias("node"), F.lit(0).alias("dist")
    ).distinct().localCheckpoint(eager=True)
    frontier = visited.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth))
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank: the restart mass returns to the SEED set
    instead of spreading uniformly — r_{k+1}(v) = (1-d)·1[v∈S]/|S| +
    d·Σ_{u->v} r_k(u)/deg(u), r_0 = uniform over S.  The
    "importance relative to these nodes" query (related-item discovery,
    contamination spread from flagged docs) that global PageRank (a56)
    can't answer.

    Same scale shape as `pagerank`: degree table broadcast into the edge
    join, ranks node-bounded, one agg shuffle per round; the seed restart
    is a broadcast outer-join of two node-bounded tables.  After k rounds
    mass exists only within the seeds' k-hop neighborhood, so the rank
    table tracks the neighborhood, not the graph.  Ranks rounded to 6 at
    the end; each round's rank is a pure expression over the previous
    round's (oracle: the unrolled-round SQL twin, a56-style)."""
    edges = edges.select("src", "dst").localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    # Accept any 1-column seed frame (mirroring bfs_distances) and dedup:
    # duplicate seed rows would inflate |S| and double-count restart mass
    # through the broadcast joins.
    seeds = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    n_seeds = seeds.count()
    base = (1.0 - damping) / n_seeds
    seed_base = seeds.select(
        F.col("node"), F.lit(base).alias("__base")
    )
    e = edges.join(F.broadcast(deg), "src").select("src", "dst", "deg")
    ranks = seeds.select("node", F.lit(1.0 / n_seeds).alias("rank"))
    for i in range(iterations):
        prop = (
            e.join(F.broadcast(ranks), e.src == F.col("node"))
            .groupBy("dst")
            .agg((F.lit(damping) * F.sum(F.col("rank") / F.col("deg"))).alias("__prop"))
            .select(F.col("dst").alias("node"), "__prop")
        )
        ranks = prop.join(F.broadcast(seed_base), "node", "full_outer").select(
            "node",
            (
                F.coalesce(F.col("__base"), F.lit(0.0))
                + F.coalesce(F.col("__prop"), F.lit(0.0))
            ).alias("rank"),
        )
        # every fourth round only — see pagerank: each localCheckpoint is
        # a blocking driver job; short recurrences evaluate lazily in the
        # final action, long ones still get a bounded plan
        if (i + 1) % 4 == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank")).orderBy("node")
