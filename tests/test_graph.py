"""Connected components: known graphs, a randomized union-find
differential, and convergence/lineage behavior."""

from __future__ import annotations

import random

import pytest

from redskins_rule_spark.operators.graph import connected_components, dedup_clusters


def _cc(spark, edge_list, **kw):
    edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    got = connected_components(edges, **kw).collect()
    return {r.id: r.component for r in got}


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 and triangle 10-11-12
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_direction_self_loops_duplicates_ignored(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 2), (2, 3), (5, 5)])
    # 5's only edge is a self-loop → not incident to a real edge → absent
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_converges_fast(spark):
    # pointer jumping: a 64-node chain must close in far fewer than
    # 64 rounds (O(log n), not O(diameter))
    n = 64
    got = _cc(spark, [(i, i + 1) for i in range(n)], max_rounds=10)
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(edges)
    got = _cc(spark, edges)
    assert got == want


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_rounds=1)


def test_dedup_clusters_column_contract(spark):
    pairs = spark.createDataFrame(
        [(3, 9), (9, 12)], "id_a bigint, id_b bigint"
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(
            pairs, id_col="doc_id", cluster_col="cluster_id"
        ).collect()
    }
    assert got == {(3, 3), (9, 3), (12, 3)}


# -- pagerank ----------------------------------------------------------------

import pytest  # noqa: E402

from redskins_rule_spark.operators.graph import pagerank  # noqa: E402


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np
    import random

    rng = random.Random(7)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")

    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    outdeg = {v: 0 for v in nodes}
    for a, _ in edges:
        outdeg[a] += 1
    r = np.full(N, 1.0 / N)
    for _ in range(3):
        nxt = np.full(N, 0.15 / N)
        for a, b in edges:
            nxt[idx[b]] += 0.85 * r[idx[a]] / outdeg[a]
        r = nxt

    got = {row["id"]: row["rank"] for row in pagerank(df, iterations=3).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], rel=1e-9)


def test_pagerank_mass_and_validation(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src bigint, dst bigint")
    ranks = {r["id"]: r["rank"] for r in pagerank(df, iterations=5).collect()}
    # symmetric cycle, no dangling loss: uniform 1/3 and mass conserved
    for v in ranks.values():
        assert v == pytest.approx(1 / 3, rel=1e-12)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=-1)


def test_reliable_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir= switches lineage cuts from executor-local blocks
    to a reliable shared-filesystem checkpoint (cluster-durable); the
    results must be identical and checkpoint files must actually land
    in the directory."""
    import os

    from redskins_rule_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 4), (5, 6), (2, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    ckpt = str(tmp_path / "ckpt")

    local = connected_components(df)
    reliable = connected_components(df, checkpoint_dir=ckpt)
    assert sorted(map(tuple, local.collect())) == sorted(map(tuple, reliable.collect()))
    assert any(os.scandir(ckpt)), "no reliable checkpoint files written"

    pr_local = {r["id"]: r["rank"] for r in pagerank(df, iterations=2).collect()}
    pr_rel = {
        r["id"]: r["rank"]
        for r in pagerank(df, iterations=2, checkpoint_dir=ckpt).collect()
    }
    assert pr_local == pytest.approx(pr_rel, rel=1e-12)


def test_checkpoint_truncates_lineage_both_modes(spark, tmp_path):
    """Both materialization modes must cut lineage: the post-round plan
    may not contain the upstream edge producer (a join marker node)."""
    from redskins_rule_spark.operators.graph import _materialize

    a = spark.createDataFrame([(1, 10)], "src bigint, x bigint")
    b = spark.createDataFrame([(1, 20)], "src bigint, dst bigint")
    produced = a.join(b, "src").select("src", "dst")  # upstream with a join
    for ckpt in (None, str(tmp_path / "ckpt2")):
        cut = _materialize(produced, ckpt)
        plan = cut._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan, f"lineage not truncated (ckpt={ckpt}): {plan}"


# --- triangle counting ------------------------------------------------------

def test_triangle_count_known_graphs(spark):
    from redskins_rule_spark.operators.graph import triangle_count

    # K4: 4 triangles; plus a pendant path (5-6-7): 0 extra
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(5, 6), (6, 7)], "src long, dst long"
    )
    row = triangle_count(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (7, 8, 4)


def test_triangle_count_dups_reversals_loops(spark):
    from redskins_rule_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)],
        "src long, dst long",
    )
    row = triangle_count(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)


def test_triangle_count_hub_star_has_none(spark):
    # star graph: many wedges at the hub under naive orientation, but
    # degree ordering sends every edge leaf->hub: zero wedges, zero triangles
    from redskins_rule_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 30)], "src long, dst long"
    )
    row = triangle_count(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (30, 29, 0)


# --- k-core ----------------------------------------------------------------

def test_kcore_triangle_with_pendant(spark):
    from redskins_rule_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    out = {r.id: r.degree for r in kcore(edges, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}  # pendant 4 peeled, triangle survives


def test_kcore_path_peels_to_empty(spark):
    from redskins_rule_spark.operators.graph import kcore

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src long, dst long"
    )
    assert kcore(path, k=2).count() == 0
    # bounded peel stops early: after ONE round only the end nodes are
    # gone (1 and 6), leaving the inner path 2-3-4-5
    bounded = {r.id for r in kcore(path, k=2, max_rounds=1).collect()}
    assert bounded == {2, 3, 4, 5}


def test_kcore_matches_python_reference_random(spark):
    import random

    from redskins_rule_spark.operators.graph import kcore

    rng = random.Random(11)
    edges = {tuple(sorted((rng.randint(0, 14), rng.randint(0, 14))))
             for _ in range(40)}
    edges = [(a, b) for a, b in edges if a != b]

    def ref_kcore(es, k):
        es = set(es)
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {v for v, d in deg.items() if d >= k}
            nes = {(a, b) for a, b in es if a in keep and b in keep}
            if nes == es:
                return deg if es else {}
            es = nes

    for k in (2, 3, 4):
        want = ref_kcore(edges, k)
        want = {v: d for v, d in want.items()} if want else {}
        df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
        got = {r.id: r.degree for r in kcore(df, k=k).collect()}
        assert got == want, k
