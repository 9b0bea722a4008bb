"""Parity tests for the round-3 structural operators: DAG layering,
k-truss, and Borůvka minimum spanning forest.

Reference semantics: igraph `topological_sorting` (re-expressed as
the canonical longest-path layering — any topo order is ORDER BY
(level, id)), `Graph.k_truss`-style trussness, and
`minimum_spanning_tree` (igraph uses Prim; Borůvka returns the same
forest under the (w, a, b) total edge order). networkx is the value
oracle throughout; the DuckDB twins are exercised by the driver
contract (tools/driver_check.py)."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from graftlink.dag import is_dag, topo_levels
from graftlink.mst import minimum_spanning_forest
from graftlink.truss import k_truss

from tests.conftest import edges_df


# ---------------------------------------------------------------------------
# topo_levels / is_dag
# ---------------------------------------------------------------------------


def _nx_levels(G: nx.DiGraph) -> dict:
    # level(v) = longest directed path ending at v
    lev = {v: 0 for v in G.nodes}
    for v in nx.topological_sort(G):
        for u in G.predecessors(v):
            lev[v] = max(lev[v], lev[u] + 1)
    return lev


def test_topo_levels_diamond(spark):
    # 0 -> {1, 2} -> 3 -> 4 ; 5 isolated-source edge 5 -> 4
    df = edges_df(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 4)])
    got = {r.id: r.level for r in topo_levels(df).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3, 5: 0}


def test_topo_levels_random_dag_matches_networkx(spark):
    rnd = random.Random(11)
    pairs = set()
    while len(pairs) < 150:
        a, b = rnd.randrange(60), rnd.randrange(60)
        if a < b:  # low->high orientation is acyclic by construction
            pairs.add((a, b))
    G = nx.DiGraph(pairs)
    got = {r.id: r.level for r in topo_levels(edges_df(spark, pairs)).collect()}
    assert got == _nx_levels(G)


def test_topo_levels_cycle_raises(spark):
    df = edges_df(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    with pytest.raises(ValueError, match="cycle"):
        topo_levels(df).count()


def test_is_dag(spark):
    assert is_dag(edges_df(spark, [(0, 1), (1, 2), (0, 2)]))
    assert not is_dag(edges_df(spark, [(0, 1), (1, 2), (2, 0)]))


# ---------------------------------------------------------------------------
# k-truss
# ---------------------------------------------------------------------------


def test_k_truss_k4_peels_pendant_triangle(spark):
    # K4 on {0,1,2,3} plus a pendant triangle {3,4,5}: the pendant
    # triangle's edges have support 1 < k-2 = 2 and must peel; the K4
    # survives (every K4 edge closes 2 triangles within the K4).
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = edges_df(spark, k4 + [(3, 4), (3, 5), (4, 5)])
    got = sorted((r.a, r.b) for r in k_truss(df, 4).collect())
    assert got == sorted(k4)


def test_k_truss_matches_networkx(spark):
    rnd = random.Random(23)
    pairs = {tuple(sorted(rnd.sample(range(30), 2))) for _ in range(170)}
    df = edges_df(spark, pairs)
    G = nx.Graph(pairs)
    for k in (3, 4, 5):
        got = sorted((r.a, r.b) for r in k_truss(df, k).collect())
        exp = sorted(tuple(sorted(e)) for e in nx.k_truss(G, k).edges)
        assert got == exp, f"k={k}"


def test_k_truss_k2_is_simple_undirected(spark):
    # k<=2: whole simple undirected edge set, dedup + self-loop drop
    df = edges_df(spark, [(1, 0), (0, 1), (2, 2), (1, 2)])
    got = sorted((r.a, r.b) for r in k_truss(df, 2).collect())
    assert got == [(0, 1), (1, 2)]


# ---------------------------------------------------------------------------
# minimum spanning forest
# ---------------------------------------------------------------------------


def _kruskal(rows):
    """Deterministic Kruskal under the (w, a, b) total order — the
    unique forest Borůvka must reproduce."""
    best = {}
    for a, b, w in rows:
        if a == b:
            continue
        e = (min(a, b), max(a, b))
        if e not in best or w < best[e]:
            best[e] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    out = []
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def test_msf_two_components_multiedges(spark):
    rnd = random.Random(7)
    rows = [
        (rnd.randrange(40), rnd.randrange(40), round(rnd.random() * 10, 3))
        for _ in range(260)
    ]
    rows += [
        (100 + rnd.randrange(20), 100 + rnd.randrange(20), round(rnd.random() * 10, 3))
        for _ in range(70)
    ]
    rows.append((5, 5, 0.001))  # self-loop drops
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = sorted(
        (r.a, r.b, r.weight) for r in minimum_spanning_forest(df).collect()
    )
    assert got == _kruskal(rows)
    # forest weight is unique regardless of tie-breaks: check networkx
    G = nx.Graph()
    for a, b, w in rows:
        if a != b and (not G.has_edge(a, b) or w < G[min(a, b)][max(a, b)]["weight"]):
            G.add_edge(min(a, b), max(a, b), weight=w)
    nx_w = nx.minimum_spanning_tree(G).size(weight="weight")
    assert sum(w for _, _, w in got) == pytest.approx(nx_w, rel=1e-12)


def test_msf_duplicate_weights_deterministic(spark):
    # all weights equal: the (w, a, b) order alone decides the forest
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3)]
    rows = [(a, b, 1.0) for a, b in pairs]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = sorted((r.a, r.b, r.weight) for r in minimum_spanning_forest(df).collect())
    assert got == _kruskal(rows) == [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0)]


def test_msf_empty_after_loops(spark):
    df = spark.createDataFrame([(3, 3, 1.0)], "src long, dst long, weight double")
    assert minimum_spanning_forest(df).count() == 0
