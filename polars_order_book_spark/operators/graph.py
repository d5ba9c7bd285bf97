"""Iterative graph algorithms over edge DataFrames.

Connected components (operators.dedup) answers "which docs are the same";
PageRank answers "which nodes matter" — the centrality measure curation
pipelines use to weight sources (domain authority over a link graph) or to
pick cluster exemplars (highest-centrality member of a near-dup component).

Exactness contract: ranks are kept as SCALED BIGINTs (units of 1e-12) and
every step is integer arithmetic — integer division truncates identically in
Spark (`div`) and DuckDB (`//`) for non-negative operands, and BIGINT sums
are exact and order-independent, unlike float sums whose partial-aggregation
order Spark does not fix. An oracle can therefore hash the output
bit-for-bit. The quantization error (< outdeg ulps of 1e-12 per node per
round) is irrelevant for ranking.

Scale shape per iteration: one equi-join of the edge relation with the rank
relation on src (both shuffled on node id — the SAME partitioning every
round, so the exchange is reusable), one groupBy(dst) sum. No driver-side
loop over data — the driver only unrolls a FIXED number of iteration plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # rank unit = 1e-12 of total mass


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    broadcast_max_nodes: int = 4_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over an UNDIRECTED graph (edges are
    symmetrized; every node therefore has outdegree >= 1, so there is no
    dangling-mass term). Returns (node, rank_scaled) with ranks in units of
    1e-12 (sum over nodes ~= SCALE).

    ``damping_pct`` is the damping factor in integer percent (85 = 0.85) —
    kept integral so the update ``(100-d)%/N + d% * contribs`` stays in exact
    BIGINT arithmetic end-to-end (see module docstring).

    Eagerness: node count N is materialized once up front (one count job,
    the same bounded-eager contract as neardup_components); the ``iters``
    update rounds stay one lazy composed plan.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not (0 < damping_pct < 100):
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    # localCheckpoint: sym/deg are read by EVERY iteration's join — without
    # truncation each of the `iters` plans would recompute the distinct
    # symmetrization from scratch (measured 14s -> ~8s at sf0.1, 3 iters).
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = sym.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=False)
    deg = sym.groupBy(F.col("src").alias("dnode")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_scaled"))
    # Broadcast the node-sized relations (rank vector, degree table, contrib
    # sums) into each iteration's joins when the node count allows: the big
    # side — the edge relation — is then NEVER shuffled (guide §3.1: the
    # per-iteration SortMergeJoin exchanges of `sym` become
    # BroadcastHashJoins; the only remaining edge-sized exchange is the
    # groupBy(dst) partial-aggregated shuffle). The decision is
    # scale-adaptive from the measured n, not the local core count: at
    # 4M nodes the built hash relation is ~64-128 MB — inside the guide's
    # "few hundred MB is fine" band and under Spark's 8 GB broadcast cap —
    # and bigger graphs fall back to the shuffle plan automatically.
    # BIGINT sums are order-independent, so the join strategy cannot change
    # the ranks (the oracle hashes bit-for-bit either way).
    bcast = n <= broadcast_max_nodes
    base = ((100 - damping_pct) * SCALE) // (100 * n)
    ranks = nodes.select("node", F.lit(SCALE // n).cast("long").alias("rank_scaled"))
    dg = F.broadcast(deg) if bcast else deg
    for _ in range(iters):
        rk = F.broadcast(ranks) if bcast else ranks
        contribs = (
            sym.join(rk, sym["src"] == rk["node"])
            .join(dg, sym["src"] == dg["dnode"])
            .select("dst", F.expr("rank_scaled div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        cb = F.broadcast(contribs) if bcast else contribs
        ranks = nodes.join(cb, nodes["node"] == cb["dst"], "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).cast("long").alias("rank_scaled"),
        )
    return ranks


def triangle_count(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal (community density, link-spam detection, dedup-
    cluster quality) computed with the degree-ordered orientation that
    makes distributed triangle enumeration tractable.

    Input edges may be directed, duplicated, or self-looped; they are
    canonicalized (undirected distinct, loops dropped) first. Each edge is
    then ORIENTED from its lower-ranked to higher-ranked endpoint, rank =
    (degree, node id) lexicographic. Every triangle {u,v,w} survives as
    exactly one path u→v→w plus the closing edge u→w, so a wedge self-join
    + one semi-join-like equi-join counts each triangle once — no /6
    correction, no double counting.

    Why orientation matters at scale: wedge work is Σ outdeg(n)², and
    degree-ordering bounds outdegree by O(√m) even when raw degrees are
    power-law — the hub's million neighbors generate wedges at the LOW-
    degree endpoints instead. This is the standard MR triangle algorithm
    (Suri & Vassilvitskii's partition variant shares the bound).

    Output: (node, n_triangles) for every node in ≥1 triangle, exact
    BIGINTs. Three shuffles: degree agg, wedge join on the middle node,
    closing-edge join on (u,w) — all equi-joins, salting-free by the
    orientation bound.
    """
    a, b = F.col(src_col), F.col(dst_col)
    undirected = (
        edges.where(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    both_dirs = undirected.unionByName(
        undirected.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = both_dirs.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    ranked = (
        both_dirs.join(deg.withColumnRenamed("u", "n").withColumnRenamed("d", "du"),
                       F.col("u") == F.col("n")).drop("n")
        .join(deg.withColumnRenamed("u", "n").withColumnRenamed("d", "dv"),
              F.col("v") == F.col("n")).drop("n")
    )
    # localCheckpoint: `oriented` feeds THREE join instances (two wedge
    # sides + the closing edge). Without lineage truncation Spark re-derives
    # the whole canonicalize+degree+orient subtree per instance (~9x
    # recomputation, measured as a 150-join physical plan); checkpointing
    # computes it once and the joins read the materialized partitions.
    oriented = (
        ranked.where(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
        .localCheckpoint(eager=False)
    )

    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, on="b").where(F.col("a") != F.col("c"))
    closing = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tris = wedges.join(closing, on=["a", "c"])

    # explode instead of a 3-way self-union: one pass over the triangle
    # relation instead of three re-evaluations of the two-join subtree.
    per_node = tris.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return per_node.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
