"""Path-family parity: multi-source BFS, weighted SSSP, closeness,
betweenness — exact vs networkx on directed fixtures.

Betweenness with sources = ALL vertices must equal networkx
betweenness_centrality(normalized=False) exactly (same Brandes
recurrences; float compare at 1e-9 after the 6-dp round on our side
is replaced by raw compare via a no-round helper — we compare the
rounded values against networkx rounded identically).
"""

from __future__ import annotations

import networkx as nx
import pytest

from graftlink.paths import (
    betweenness_from_sources,
    closeness_from_sources,
    multi_source_bfs,
    sssp_weighted,
)
from tests.conftest import edges_df
from tests.oracles import er_edges

FIX = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 0), (2, 5), (5, 6), (6, 2)]
N_FIX = 7


def digraph(pairs, n):
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    return g


def test_multi_source_bfs_matches_networkx(spark):
    g = digraph(FIX, N_FIX)
    got = {
        (r.source, r.id): r.dist
        for r in multi_source_bfs(edges_df(spark, FIX), [0, 5]).collect()
    }
    want = {}
    for s in (0, 5):
        for v, d in nx.single_source_shortest_path_length(g, s).items():
            want[(s, v)] = d
    assert got == want


def test_sssp_weighted_matches_dijkstra(spark):
    from pyspark.sql import functions as F

    e = edges_df(spark, FIX).withColumn(
        "weight", (F.col("src") % 7 + F.col("dst") % 3 + 1).cast("double")
    )
    g = nx.DiGraph()
    g.add_weighted_edges_from([(a, b, a % 7 + b % 3 + 1) for a, b in FIX])
    want = nx.single_source_dijkstra_path_length(g, 0)
    got = {r.id: r.dist for r in sssp_weighted(e, 0).collect()}
    assert got == {v: float(d) for v, d in want.items()}


def test_closeness_matches_networkx(spark):
    g = digraph(FIX, N_FIX)
    got = {
        r.id: r.closeness
        for r in closeness_from_sources(edges_df(spark, FIX), [0, 2, 5]).collect()
    }
    for s in (0, 2, 5):
        dists = nx.single_source_shortest_path_length(g, s)
        want = (len(dists) - 1) / sum(dists.values()) if sum(dists.values()) else 0.0
        assert got[s] == round(want, 6)


@pytest.mark.parametrize("seed", [1, 2])
def test_betweenness_all_sources_exact(spark, seed):
    n = 25
    pairs = [(a, b) for a, b in er_edges(n, 0.1, seed) if a != b]
    g = digraph(pairs, n)
    want = nx.betweenness_centrality(g, normalized=False)
    got = {
        r.id: r.betweenness
        for r in betweenness_from_sources(
            edges_df(spark, pairs), sources=list(range(n))
        ).collect()
    }
    assert set(got) == set(range(n))
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_betweenness_star_center(spark):
    # directed star in+out: center relays every leaf pair
    leaves = range(1, 6)
    pairs = [(0, i) for i in leaves] + [(i, 0) for i in leaves]
    got = {
        r.id: r.betweenness
        for r in betweenness_from_sources(
            edges_df(spark, pairs), sources=list(range(6))
        ).collect()
    }
    want = nx.betweenness_centrality(digraph(pairs, 6), normalized=False)
    for v in range(6):
        assert got[v] == pytest.approx(want[v], abs=2e-6)


def test_pseudo_diameter_tree_exact_and_lb(spark):
    from graftlink.paths import pseudo_diameter

    # path graph (a tree): double sweep is exact
    n = 9
    chain = [(i, i + 1) for i in range(n - 1)]
    row = pseudo_diameter(edges_df(spark, chain), start=4).collect()[0]
    assert row.diameter_lb == n - 1
    # general graph: result is a lower bound on the true diameter and
    # matches a pure-python double sweep with the same tie-break
    pairs = [(a, b) for a, b in er_edges(30, 0.08, 7) if a != b]
    g = nx.Graph()
    g.add_edges_from(pairs)
    comp = max(nx.connected_components(g), key=len)
    start = min(comp)
    d1 = nx.single_source_shortest_path_length(g, start)
    far = min(v for v in d1 if d1[v] == max(d1.values()))
    d2 = nx.single_source_shortest_path_length(g, far)
    want = max(d2.values())
    row = pseudo_diameter(edges_df(spark, pairs), start=start).collect()[0]
    assert row.far_id == far
    assert row.diameter_lb == want
    assert row.diameter_lb <= nx.diameter(g.subgraph(comp))


def test_eccentricity_harmonic_vs_networkx(spark):
    from graftlink.paths import eccentricity_harmonic_from_sources

    g = digraph(FIX, N_FIX)
    got = {
        r.id: (r.eccentricity, r.harmonic)
        for r in eccentricity_harmonic_from_sources(
            edges_df(spark, FIX), [0, 2, 5]
        ).collect()
    }
    for s in (0, 2, 5):
        d = nx.single_source_shortest_path_length(g, s)
        ecc = max(d.values())
        harm = sum(1.0 / v for v in d.values() if v > 0)
        assert got[s][0] == ecc
        assert got[s][1] == round(harm, 6)


# ---------------------------------------------------------------------------
# round-3: igraph mode flags + normalization (VERDICT next #8)
# ---------------------------------------------------------------------------


def _digraph(pairs):
    g = nx.DiGraph()
    g.add_edges_from(pairs)
    return g


def test_closeness_mode_in_matches_networkx(spark):
    """mode='in' = distances INTO the vertex — exactly networkx's
    closeness_centrality convention (wf_improved=False ==
    our normalized=True form (r-1)/sum d)."""
    pairs = er_edges(40, 0.08, 31)
    e = edges_df(spark, pairs)
    g = _digraph(pairs)
    srcs = sorted(g.nodes)
    got = {
        r.id: r.closeness
        for r in closeness_from_sources(e, srcs, mode="in").collect()
    }
    want = nx.closeness_centrality(g, wf_improved=False)
    for v in srcs:
        assert abs(got[v] - round(want[v], 6)) < 1e-6, v


def test_closeness_mode_all_and_raw(spark):
    pairs = er_edges(40, 0.08, 32)
    e = edges_df(spark, pairs)
    g = nx.Graph(pairs)
    srcs = sorted(g.nodes)
    got = {
        r.id: r.closeness
        for r in closeness_from_sources(
            e, srcs, mode="all", normalized=False
        ).collect()
    }
    for v in srcs:
        d = nx.single_source_shortest_path_length(g, v)
        s = sum(d.values())
        want = 1.0 / s if s > 0 else 0.0
        assert abs(got[v] - round(want, 6)) < 1e-6, v


def test_harmonic_normalized_and_mode_in(spark):
    from graftlink.paths import eccentricity_harmonic_from_sources

    pairs = er_edges(40, 0.08, 33)
    e = edges_df(spark, pairs)
    g = _digraph(pairs)
    srcs = sorted(g.nodes)
    n = g.number_of_nodes()
    got = {
        r.id: r.harmonic
        for r in eccentricity_harmonic_from_sources(
            e, srcs, mode="in", normalized=True
        ).collect()
    }
    # networkx harmonic_centrality sums 1/d over INcoming distances
    want = nx.harmonic_centrality(g)
    for v in srcs:
        assert abs((got[v] or 0.0) - round(want[v] / (n - 1), 6)) < 1e-6, v


def test_betweenness_normalized_matches_networkx(spark):
    pairs = er_edges(30, 0.1, 34)
    e = edges_df(spark, pairs)
    g = _digraph(pairs)
    srcs = sorted(g.nodes)
    got = {
        r.id: r.betweenness
        for r in betweenness_from_sources(
            e, srcs, normalized=True
        ).collect()
    }
    want = nx.betweenness_centrality(g, normalized=True)
    for v in srcs:
        assert abs(got[v] - want[v]) < 1e-5, v


def test_betweenness_rescale_is_n_over_k(spark):
    pairs = er_edges(30, 0.1, 35)
    e = edges_df(spark, pairs)
    n = _digraph(pairs).number_of_nodes()
    srcs = [0, 1, 2]
    raw = {
        r.id: r.betweenness
        for r in betweenness_from_sources(e, srcs).collect()
    }
    scaled = {
        r.id: r.betweenness
        for r in betweenness_from_sources(e, srcs, rescale=True).collect()
    }
    for v in raw:
        assert abs(scaled[v] - raw[v] * n / len(srcs)) < 1e-4, v


# ---- round 4: shortest-path reconstruction (verdict Missing #1) ----


def _min_parents(g, dists, weight=None):
    """The engine's deterministic parent rule, computed independently:
    parent(v) = min{u : (u,v) in E, dist(u) + w(u,v) == dist(v)}."""
    out = {}
    for u, v, data in g.edges(data=True):
        du, dv = dists.get(u), dists.get(v)
        if du is None or dv is None:
            continue
        w = data["weight"] if weight else 1
        if du + w == dv and (v not in out or u < out[v]):
            out[v] = u
    return out


def test_bfs_parents_matches_min_parent_oracle(spark):
    from graftlink.paths import bfs_parents

    g = digraph(FIX, N_FIX)
    dists = nx.single_source_shortest_path_length(g, 0)
    want_par = _min_parents(g, dists)
    rows = bfs_parents(edges_df(spark, FIX), 0).collect()
    assert {r.id: r.dist for r in rows} == dict(dists)
    assert {r.id: r.parent for r in rows} == {
        v: want_par.get(v) for v in dists
    }


def test_multi_source_parents_matches_oracle(spark):
    from graftlink.paths import multi_source_parents

    g = digraph(FIX, N_FIX)
    rows = multi_source_parents(edges_df(spark, FIX), [0, 5]).collect()
    for s in (0, 5):
        dists = nx.single_source_shortest_path_length(g, s)
        want_par = _min_parents(g, dists)
        got = {r.id: (r.dist, r.parent) for r in rows if r.source == s}
        assert got == {v: (d, want_par.get(v)) for v, d in dists.items()}


def test_sssp_parents_matches_dijkstra_min_parent(spark):
    from pyspark.sql import functions as F

    from graftlink.paths import sssp_parents

    e = edges_df(spark, FIX).withColumn(
        "weight", (F.col("src") % 7 + F.col("dst") % 3 + 1).cast("double")
    )
    g = nx.DiGraph()
    g.add_weighted_edges_from([(a, b, float(a % 7 + b % 3 + 1)) for a, b in FIX])
    dists = nx.single_source_dijkstra_path_length(g, 0)
    want_par = _min_parents(g, dists, weight=True)
    rows = sssp_parents(e, 0).collect()
    assert {r.id: r.dist for r in rows} == {v: float(d) for v, d in dists.items()}
    assert {r.id: r.parent for r in rows} == {v: want_par.get(v) for v in dists}


def _walk_expected(dists, parents, target):
    """Walk the min-parent tree back; expected (step, id, dist) rows."""
    rev = []
    node = target
    while node is not None:
        rev.append((node, dists[node]))
        node = parents.get(node)
    return [(i, v, d) for i, (v, d) in enumerate(reversed(rev))]


def test_shortest_path_bfs_exact(spark):
    from graftlink.paths import shortest_path

    g = digraph(FIX, N_FIX)
    dists = nx.single_source_shortest_path_length(g, 0)
    parents = _min_parents(g, dists)
    got = [
        (r.step, r.id, r.dist)
        for r in shortest_path(edges_df(spark, FIX), 0, 4).orderBy("step").collect()
    ]
    assert got == _walk_expected(dists, parents, 4)
    # and it is a genuine shortest path over real edges
    es = set(FIX)
    assert all((got[i][1], got[i + 1][1]) in es for i in range(len(got) - 1))
    assert got[-1][2] == dists[4] == len(got) - 1


def test_shortest_path_weighted_exact(spark):
    from pyspark.sql import functions as F

    from graftlink.paths import shortest_path

    e = edges_df(spark, FIX).withColumn(
        "weight", (F.col("src") % 7 + F.col("dst") % 3 + 1).cast("double")
    )
    g = nx.DiGraph()
    g.add_weighted_edges_from([(a, b, float(a % 7 + b % 3 + 1)) for a, b in FIX])
    dists = nx.single_source_dijkstra_path_length(g, 0)
    parents = _min_parents(g, dists, weight=True)
    got = [
        (r.step, r.id, r.dist)
        for r in shortest_path(e, 0, 6, weighted=True).orderBy("step").collect()
    ]
    assert got == _walk_expected(dists, parents, 6)


def test_shortest_path_unreachable_is_empty(spark):
    from graftlink.paths import shortest_path

    # 4 -> 5 unreachable in FIX's directed orientation? ensure with an
    # isolated target id instead: 99 appears in no edge
    e = edges_df(spark, FIX + [(99, 98)])
    assert shortest_path(e, 0, 99).count() == 0


def test_shortest_path_undirected(spark):
    from graftlink.paths import shortest_path

    g = nx.Graph()
    g.add_edges_from(FIX)
    dists = nx.single_source_shortest_path_length(g, 6)
    sym = nx.DiGraph()
    for a, b in FIX:
        sym.add_edge(a, b)
        sym.add_edge(b, a)
    parents = _min_parents(sym, dists)
    got = [
        (r.step, r.id, r.dist)
        for r in shortest_path(edges_df(spark, FIX), 6, 1, directed=False)
        .orderBy("step")
        .collect()
    ]
    assert got == _walk_expected(dists, parents, 1)


@pytest.mark.parametrize("seed", [1, 2])
def test_edge_betweenness_all_sources_exact(spark, seed):
    from graftlink.paths import edge_betweenness_from_sources

    n = 25
    pairs = [(a, b) for a, b in er_edges(n, 0.1, seed) if a != b]
    g = digraph(pairs, n)
    want = nx.edge_betweenness_centrality(g, normalized=False)
    got = {
        (r.src, r.dst): r.betweenness
        for r in edge_betweenness_from_sources(
            edges_df(spark, pairs), sources=list(range(n))
        ).collect()
    }
    assert set(got) == set(pairs)
    for e in pairs:
        assert got[e] == pytest.approx(want[e], abs=2e-6), e


def test_edge_betweenness_subset_matches_networkx(spark):
    from graftlink.paths import edge_betweenness_from_sources

    pairs = [(a, b) for a, b in er_edges(20, 0.12, 5) if a != b]
    g = digraph(pairs, 20)
    srcs = [0, 3, 7, 11]
    want = nx.edge_betweenness_centrality_subset(
        g, sources=srcs, targets=list(g.nodes()), normalized=False
    )
    got = {
        (r.src, r.dst): r.betweenness
        for r in edge_betweenness_from_sources(
            edges_df(spark, pairs), sources=srcs
        ).collect()
    }
    for e in pairs:
        assert got[e] == pytest.approx(want[e], abs=2e-6), e


def test_edge_betweenness_path_graph(spark):
    # directed path 0->1->2->3: edge (i,i+1) carries (i+1)*(3-i) pairs
    from graftlink.paths import edge_betweenness_from_sources

    pairs = [(0, 1), (1, 2), (2, 3)]
    got = {
        (r.src, r.dst): r.betweenness
        for r in edge_betweenness_from_sources(
            edges_df(spark, pairs), sources=[0, 1, 2, 3]
        ).collect()
    }
    assert got == {(0, 1): 3.0, (1, 2): 4.0, (2, 3): 3.0}


def test_subcomponent_modes_match_networkx(spark):
    from graftlink.paths import subcomponent

    pairs = FIX + [(8, 9)]  # detached component
    g = digraph(pairs, 10)
    e = edges_df(spark, pairs)
    out = {r.id for r in subcomponent(e, 2, mode="out").collect()}
    assert out == nx.descendants(g, 2) | {2}
    inn = {r.id for r in subcomponent(e, 2, mode="in").collect()}
    assert inn == nx.ancestors(g, 2) | {2}
    allm = {r.id for r in subcomponent(e, 2, mode="all").collect()}
    assert allm == set(nx.node_connected_component(g.to_undirected(), 2))
    assert {r.id for r in subcomponent(e, 8, mode="all").collect()} == {8, 9}


def test_shortest_paths_to_matches_single_walks(spark):
    from graftlink.paths import shortest_path, shortest_paths_to

    pairs = [(a, b) for a, b in er_edges(25, 0.12, 3) if a != b]
    e = edges_df(spark, pairs)
    targets = [5, 11, 17, 23]
    batched = {}
    for r in shortest_paths_to(e, 0, targets).collect():
        batched.setdefault(r.target, []).append((r.step, r.id, r.dist))
    for t in targets:
        single = [(r.step, r.id, r.dist) for r in shortest_path(e, 0, t).collect()]
        got = sorted(batched.get(t, []))
        assert got == sorted(single), t
    # every returned path is a valid edge walk of the right length
    g = nx.DiGraph(pairs)
    for t, cells in batched.items():
        cells = sorted(cells)
        ids = [c[1] for c in cells]
        assert ids[0] == 0 and ids[-1] == t
        assert len(ids) - 1 == nx.shortest_path_length(g, 0, t)
        for a, b in zip(ids, ids[1:]):
            assert g.has_edge(a, b)


def test_shortest_paths_to_weighted(spark):
    from pyspark.sql import functions as F
    from graftlink.paths import shortest_paths_to

    pairs = [(a, b) for a, b in er_edges(20, 0.15, 8) if a != b]
    e = edges_df(spark, pairs).withColumn(
        "weight", (F.col("src") % 7 + F.col("dst") % 3 + 1).cast("double")
    )
    g = nx.DiGraph()
    g.add_weighted_edges_from([(a, b, a % 7 + b % 3 + 1.0) for a, b in pairs])
    out = {}
    for r in shortest_paths_to(e, 0, [10, 19], weighted=True).collect():
        out.setdefault(r.target, []).append((r.step, r.id, r.dist))
    for t, cells in out.items():
        cells = sorted(cells)
        ids = [c[1] for c in cells]
        want_len = nx.dijkstra_path_length(g, 0, t)
        assert cells[-1][2] == pytest.approx(want_len), t
        # valid walk with matching cumulative weight
        total = sum(g[a][b]["weight"] for a, b in zip(ids, ids[1:]))
        assert total == pytest.approx(want_len)
