"""Parity tests for the bipartite family (graftlink/bipartite.py) vs
networkx, and for kNN-graph construction (graftlink/knn.py) vs a
numpy brute-force oracle + tiled/allpairs set equality. Both are also
oracle-checked cross-engine through the driver contract
(__spark_entry__.oracle_sql)."""

from __future__ import annotations

import numpy as np
import pytest

from graftlink.bipartite import bipartite_check, bipartite_projection, bipartite_sides
from graftlink.knn import knn_graph
from tests.conftest import edges_df
from tests.oracles import er_edges

nx = pytest.importorskip("networkx")


# ---------------------------------------------------------------------------
# bipartite
# ---------------------------------------------------------------------------

EVEN_CYCLE = [(i, (i + 1) % 8) for i in range(8)]
ODD_CYCLE = [(i, (i + 1) % 7) for i in range(7)]
TWO_COMP = EVEN_CYCLE + [(100 + i, 100 + (i + 1) % 6) for i in range(6)]


def _sides(spark, pairs):
    return {r.id: r.side for r in bipartite_sides(edges_df(spark, pairs)).collect()}


def test_even_cycle_bipartite(spark):
    row = bipartite_check(edges_df(spark, EVEN_CYCLE)).collect()[0]
    assert row.odd_edges == 0 and bool(row.is_bipartite)
    sides = _sides(spark, EVEN_CYCLE)
    # valid 2-coloring, root 0 on side 0
    assert sides[0] == 0
    for a, b in EVEN_CYCLE:
        assert sides[a] != sides[b]


def test_odd_cycle_not_bipartite(spark):
    row = bipartite_check(edges_df(spark, ODD_CYCLE)).collect()[0]
    assert row.odd_edges >= 1 and not bool(row.is_bipartite)


def test_disconnected_components_independent_roots(spark):
    sides = _sides(spark, TWO_COMP)
    assert sides[0] == 0 and sides[100] == 0  # each component's min id is its root
    for a, b in TWO_COMP:
        assert sides[a] != sides[b]
    row = bipartite_check(edges_df(spark, TWO_COMP)).collect()[0]
    assert bool(row.is_bipartite)


def test_er_graph_matches_networkx_verdict(spark):
    pairs = er_edges(40, 0.08, seed=11)
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    row = bipartite_check(edges_df(spark, pairs)).collect()[0]
    assert bool(row.is_bipartite) == nx.is_bipartite(g)


def test_sides_are_bfs_parity(spark):
    """side(v) must equal (shortest-path distance from the component
    min-id root) mod 2 — the deterministic contract."""
    pairs = er_edges(36, 0.1, seed=3)
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    sides = _sides(spark, pairs)
    for comp in nx.connected_components(g):
        root = min(comp)
        dist = nx.single_source_shortest_path_length(g, root)
        for v in comp:
            assert sides[v] == dist[v] % 2, (v, root)


def test_projection_brute(spark):
    pairs = [(o, p) for o, p in er_edges(30, 0.2, seed=5)]
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "l long, r long"
    )
    got = {
        (x.a, x.b): x.weight
        for x in bipartite_projection(df, "l", "r").collect()
    }
    from collections import defaultdict

    rights = defaultdict(set)
    for l, r in set(pairs):
        rights[l].add(r)
    want = defaultdict(int)
    for l, rs in rights.items():
        rs = sorted(rs)
        for i, a in enumerate(rs):
            for b in rs[i + 1 :]:
                want[(a, b)] += 1
    assert got == dict(want)


def test_projection_left_degree_cap(spark):
    # one hub left vertex with degree 4 is dropped at cap 3
    pairs = [(0, 1), (0, 2), (0, 3), (0, 4), (9, 1), (9, 2)]
    df = spark.createDataFrame(pairs, "l long, r long")
    got = {
        (x.a, x.b): x.weight
        for x in bipartite_projection(df, "l", "r", max_left_degree=3).collect()
    }
    assert got == {(1, 2): 1}


# ---------------------------------------------------------------------------
# knn graph
# ---------------------------------------------------------------------------


def _vec_df(spark, n=60, d=8, seed=9, zero_ids=(7,)):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, d)
    for z in zero_ids:
        m[z] = 0.0
    rows = [(int(i), [float(x) for x in m[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        m,
    )


def _brute_knn(m, k):
    n = m.shape[0]
    norms = np.linalg.norm(m, axis=1)
    safe = np.where(norms == 0, np.inf, norms)
    u = m / safe[:, None]
    c = np.round(u @ u.T, 6)
    want = set()
    for i in range(n):
        cand = [(-c[i, j], j) for j in range(n) if j != i]
        cand.sort()
        for nc, j in cand[:k]:
            want.add((i, j, -nc))
    return want


def test_knn_tiled_equals_allpairs_equals_brute(spark):
    df, m = _vec_df(spark)
    tiled = {(r.src, r.dst, r.cos) for r in knn_graph(df, k=4, block_rows=16).collect()}
    allp = {(r.src, r.dst, r.cos) for r in knn_graph(df, k=4, method="allpairs").collect()}
    assert tiled == allp == _brute_knn(m, 4)


def test_knn_k_larger_than_n(spark):
    df, m = _vec_df(spark, n=5, zero_ids=())
    got = knn_graph(df, k=10, block_rows=2).collect()
    assert len(got) == 5 * 4  # every other vertex, never self


def test_knn_zero_vector_gets_cos_zero(spark):
    df, m = _vec_df(spark, n=10, zero_ids=(3,), seed=2)
    rows = [r for r in knn_graph(df, k=3, block_rows=4).collect() if r.src == 3]
    assert len(rows) == 3 and all(r.cos == 0.0 for r in rows)
