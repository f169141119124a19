"""Distributed connected components — the clustering step of a
near-dup pipeline. Pair generators (`operators.dedup`:
minhash/simhash/jaccard `*_pairs`) emit near-dup EDGES; grouping a
corpus into duplicate clusters and electing one canonical document
per cluster requires the transitive closure of those edges, which no
single join can express.

Algorithm: iterative min-label propagation with pointer jumping
(path halving). Each round:

  1. neighbor min — every node adopts the smallest label among itself
     and its neighbors (one shuffle join + one hash agg);
  2. pointer jump — every node adopts its LABEL's label
     (labels self-join), halving the depth of label-reference chains.

Step 1 alone converges in O(diameter) rounds (a 100 TB-scale chain
of near-dup shards can be long); the jump in step 2 compounds labels
geometrically, giving O(log n) rounds — the classic Shiloach–Vishkin
/ MapReduce "pointer jumping" bound, same asymptotics as the
large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14).

Scale notes:
  * Every round is a fixed number of key-partitioned shuffles on the
    label frame (|V| rows) — no step ever materializes the closure.
  * Lineage is truncated after each round: without it round k
    re-plans (and can re-execute) all k-1 predecessors, and the plan
    tree grows exponentially. Default is `localCheckpoint` (fast,
    executor-local blocks); pass `checkpoint_dir=` for a RELIABLE
    checkpoint on a shared filesystem that survives executor loss on
    a real/preemptible cluster (see `_materialize`).
  * Convergence check is a metadata-sized action (count of changed
    labels), not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _materialize(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Cut lineage between iterations.

    Default `localCheckpoint` writes blocks to executor local storage —
    fastest, but an executor loss on a real cluster discards the blocks
    and the (truncated!) lineage cannot recompute them. Passing
    `checkpoint_dir` switches to a RELIABLE checkpoint on the shared
    filesystem (HDFS/object store), which survives executor loss — the
    right choice for long multi-round jobs on preemptible fleets.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
    component_col: str = "component",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every node of the undirected graph `edges` with the
    minimum node id of its connected component.

    edges : two-column (src, dst) frame; direction ignored; self-loops
            and duplicate edges tolerated (distinct-ed once).
    Returns DataFrame[id, component] for every node incident to at
    least one edge. Raises RuntimeError if not converged within
    `max_rounds` (log₂-ish bound: 25 rounds covers graphs far beyond
    any real corpus).
    """
    # Materialize the symmetrized edge list ONCE. Without this, every
    # round's `sym.join(labels)` is a fresh query execution that replans
    # and re-runs the whole upstream edge producer (for dedup clustering
    # that's the entire candidate-pair pipeline — measured 3-4x the total
    # runtime at sf0.1); shuffle reuse does not span separate actions.
    sym = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("nbr"))
        .unionByName(edges.select(F.col(dst).alias("id"), F.col(src).alias("nbr")))
        .where(F.col("id") != F.col("nbr"))
        .distinct()
    )
    sym = _materialize(sym, checkpoint_dir)
    labels = _materialize(
        sym.select("id").distinct().withColumn("lbl", F.col("id")),
        checkpoint_dir,
    )

    for _ in range(max_rounds):
        # 1. neighbor min: candidates flow along edges, keyed agg takes
        #    the min of (own label, every neighbor's label)
        nbr_lbl = sym.join(labels, on="id").select(
            F.col("nbr").alias("id"), F.col("lbl")
        )
        new_labels = (
            labels.unionByName(nbr_lbl)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
        )
        # 2. pointer jump: lbl(v) := lbl(lbl(v)) — labels frame joined
        #    to itself (label values ARE node ids, min-closed, so every
        #    label has a row)
        jump = labels.select(
            F.col("id").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        # carry the pre-round label through so convergence is a filter
        # over the (already checkpointed) result — no extra join job
        new_labels = (
            new_labels.join(
                labels.select("id", F.col("lbl").alias("prev")), on="id"
            )
            .join(jump, on="lbl", how="left")
            .select("id", F.least("lbl", "lbl2").alias("lbl"), "prev")
        )
        new_labels = _materialize(new_labels, checkpoint_dir)

        changed = new_labels.where(F.col("lbl") != F.col("prev")).count()
        labels = new_labels.drop("prev")
        if changed == 0:
            return labels.select("id", F.col("lbl").alias(component_col))
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup pairs → duplicate clusters: DataFrame[id, cluster_id]
    with cluster_id = min member id (the canonical survivor a dedup
    pass would keep). Singleton documents (no near-dup edge) are not
    emitted — callers left-join and coalesce to self."""
    cc = connected_components(pairs, src=id_a, dst=id_b, checkpoint_dir=checkpoint_dir)
    return cc.select(F.col("id").alias(id_col), F.col("component").alias(cluster_col))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    rank_col: str = "rank",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list:
    r_{t+1}(v) = (1-d)/N + d · Σ_{u→v} r_t(u)/outdeg(u), r_0 = 1/N.

    Each iteration is one edge-keyed join + one hash agg — the standard
    scale shape (contributions flow along edges; no adjacency lists are
    ever collected). Edges and the node set are materialized once
    (localCheckpoint) so iterations never re-run the upstream edge
    producer; fixed `iterations` keeps the loop free of per-round
    convergence actions (callers wanting convergence can compare
    successive frames themselves).

    Simplification, documented: dangling-node mass is NOT redistributed
    (a sink keeps receiving rank but contributes none), which matches
    the plain chained-aggregate formulation a SQL oracle can mirror
    exactly. N is a metadata-sized count.

    Returns DataFrame[id, rank_col] over every node incident to an edge.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    e = _materialize(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct(),
        checkpoint_dir,
    )
    nodes = _materialize(
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct(),
        checkpoint_dir,
    )
    n = nodes.count()
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.select("id", F.lit(1.0 / n).alias("r"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(outd, "src")
            .select(F.col("dst").alias("id"), (F.col("r") / F.col("od")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
        )
        ranks = _materialize(ranks, checkpoint_dir)
    return ranks.select("id", F.col("r").alias(rank_col))


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Exact triangle count of the undirected graph — the standard
    clustering/cohesion signal (and the classic MapReduce-era scale
    benchmark). Self-loops and duplicate/reversed edges tolerated.

    Degree-ordered orientation: every edge points from its lower
    (degree, id) endpoint to the higher, so each triangle is counted
    exactly once AND the wedge (2-path) join fans out from the LOW
    degree endpoint — Σ d_out², with d_out = O(√m) on any graph,
    instead of Σ d² which a hub node makes quadratic. This is the
    difference between a web-scale crawl graph finishing and one hot
    vertex producing 10¹² wedges.

    Returns one row: n_nodes, n_edges, n_triangles.

    The canonical edge set is consumed by FOUR subplans (degrees, the
    orientation join, both wedge sides); `materialize=True` (default)
    localCheckpoints it once so an expensive upstream lineage — e.g.
    near-dup pair generation — runs once, not four times. Pass
    `checkpoint_dir` for the executor-loss-durable variant (same
    contract as connected_components).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if materialize:
        e = _materialize(e, checkpoint_dir)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withdeg = (
        e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    ka = F.struct(F.col("da"), F.col("a"))
    kb = F.struct(F.col("db"), F.col("b"))
    o = withdeg.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ka < kb, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    x, y = o.alias("x"), o.alias("y")
    wedges = x.join(
        y,
        (F.col("x.u") == F.col("y.u"))
        & (
            F.struct(F.col("x.dv"), F.col("x.v"))
            < F.struct(F.col("y.dv"), F.col("y.v"))
        ),
    ).select(F.col("x.v").alias("wu"), F.col("y.v").alias("wv"))
    tri = wedges.join(
        o.select(F.col("u").alias("wu"), F.col("v").alias("wv")), ["wu", "wv"]
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return n_nodes.join(F.broadcast(n_edges)).join(F.broadcast(n_tri))


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-core: iteratively peel nodes of degree < k until the residual
    subgraph is stable — the standard graph-density filter (spam/bot
    subgraph mining, dense-community seeds).

    Each round is one degree aggregate + two semi joins, with lineage
    cut per round (same `_materialize` contract as
    connected_components: localCheckpoint by default, reliable
    `checkpoint_dir` for preemptible fleets). Rounds are bounded by
    the graph's degeneracy ordering in practice; `max_rounds` makes
    the result a DETERMINISTIC bounded peel (the shape an oracle can
    replay by unrolling) — pass None to run to the fixpoint.

    Returns DataFrame[id, degree]: nodes of the residual subgraph with
    their within-subgraph degrees (all >= k once converged).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = _materialize(e, checkpoint_dir)
    prev = e.count()
    rounds = 0
    while prev > 0:
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("v")
        e2 = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
        )
        e2 = _materialize(e2, checkpoint_dir)
        n = e2.count()
        e = e2
        rounds += 1
        if n == prev or n == 0:
            break
        prev = n
        if max_rounds is not None and rounds >= max_rounds:
            break
    return (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
