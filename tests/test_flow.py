"""Push-relabel maxflow / st-mincut parity vs networkx
(igraph_maxflow / igraph_st_mincut surface; networkx computes the
same value via preflow-push or shortest-augmenting-path — the VALUE
and the canonical MAXIMAL source-side cut (V minus the
residual-reach-to-t set, the min-cut lattice's unique top element)
are invariant across all maximum flows, per-arc flow matrices are
not, so parity compares value + cut)."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from graftlink.flow import max_flow, st_mincut
from tests.conftest import edges_df


def wedges_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(c)) for a, b, c in triples],
        "src long, dst long, cap double",
    )


def nx_flow(triples, s, t, directed=True):
    g = nx.DiGraph() if directed else nx.Graph()
    for a, b, c in triples:
        if g.has_edge(a, b):
            g[a][b]["capacity"] += c
        else:
            g.add_edge(a, b, capacity=c)
    return nx.maximum_flow(g, s, t)


def nx_canonical_s_side(triples, s, t, directed=True):
    """V minus the residual-reach-to-t set at networkx's max flow —
    the unique MAXIMAL source side, independent of which max flow
    either engine found (matches st_mincut's canonical partition)."""
    g = nx.DiGraph()
    for a, b, c in triples:
        for u, v in ((a, b),) if directed else ((a, b), (b, a)):
            if g.has_edge(u, v):
                g[u][v]["capacity"] += c
            else:
                g.add_edge(u, v, capacity=c)
    _, flow = nx.maximum_flow(g, s, t)
    r = nx.DiGraph()
    for u, v, d in g.edges(data=True):
        f = flow.get(u, {}).get(v, 0.0)
        if d["capacity"] - f > 1e-9:
            r.add_edge(u, v)
        if f > 1e-9:
            r.add_edge(v, u)
    r.add_node(t)
    t_side = set(nx.ancestors(r, t)) | {t}
    return set(g.nodes()) - t_side


# CLRS figure 26.6 network: max flow 23
CLRS = [
    (0, 1, 16.0),
    (0, 2, 13.0),
    (1, 3, 12.0),
    (2, 1, 4.0),
    (2, 4, 14.0),
    (3, 2, 9.0),
    (3, 5, 20.0),
    (4, 3, 7.0),
    (4, 5, 4.0),
]


def test_clrs_value_and_cut(spark):
    value, cut, sides = st_mincut(wedges_df(spark, CLRS), 0, 5, cap_col="cap")
    assert value == pytest.approx(23.0)
    got_cut = {(r.u, r.v): r.cap for r in cut.collect()}
    # canonical minimal cut of the CLRS network: {(1,3), (4,3), (4,5)}
    assert got_cut == {(1, 3): 12.0, (4, 3): 7.0, (4, 5): 4.0}
    assert sum(got_cut.values()) == pytest.approx(value)
    s_side = {r.id for r in sides.collect() if r.in_s}
    assert s_side == nx_canonical_s_side(CLRS, 0, 5)


def test_disconnected_zero_flow(spark):
    tri = [(0, 1, 5.0), (2, 3, 7.0)]
    value, cut, sides = st_mincut(wedges_df(spark, tri), 0, 3, cap_col="cap")
    assert value == 0.0
    assert cut.isEmpty()
    s_side = {r.id for r in sides.collect() if r.in_s}
    assert s_side == {0, 1}


def test_unit_capacity_default(spark):
    # unit caps (cap_col=None): maxflow == number of edge-disjoint
    # s->t paths; two disjoint 2-hop paths here
    pairs = [(0, 1), (1, 4), (0, 2), (2, 4), (1, 2)]
    value, _ = max_flow(edges_df(spark, pairs), 0, 4)
    assert value == pytest.approx(2.0)


def test_random_parity_vs_networkx(spark):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 24
        triples = [
            (i, j, float(rng.randint(1, 10)))
            for i in range(n)
            for j in range(n)
            if i != j and rng.rand() < 0.10
        ]
        s, t = 0, n - 1
        want, _ = nx_flow(triples, s, t)
        value, cut, sides = st_mincut(wedges_df(spark, triples), s, t, cap_col="cap")
        assert value == pytest.approx(float(want)), f"trial {trial}"
        assert sum(r.cap for r in cut.collect()) == pytest.approx(value)
        s_side = {r.id for r in sides.collect() if r.in_s}
        assert s_side == nx_canonical_s_side(triples, s, t), f"trial {trial}"
        assert t not in s_side


def test_undirected_parity(spark):
    rng = np.random.RandomState(11)
    triples = []
    seen = set()
    for _ in range(60):
        a, b = rng.randint(0, 18), rng.randint(0, 18)
        if a == b or (min(a, b), max(a, b)) in seen:
            continue
        seen.add((min(a, b), max(a, b)))
        triples.append((a, b, float(rng.randint(1, 8))))
    want, _ = nx_flow(triples, 0, 17, directed=False)
    value, _ = max_flow(wedges_df(spark, triples), 0, 17, cap_col="cap", directed=False)
    assert value == pytest.approx(float(want))


def test_deterministic(spark):
    df = wedges_df(spark, CLRS)
    v1, cut1, _ = st_mincut(df, 0, 5, cap_col="cap")
    v2, cut2, _ = st_mincut(df, 0, 5, cap_col="cap")
    assert v1 == v2
    assert sorted(map(tuple, cut1.collect())) == sorted(map(tuple, cut2.collect()))


def test_s_equals_t_raises(spark):
    with pytest.raises(ValueError):
        max_flow(edges_df(spark, [(0, 1)]), 0, 0)


def test_st_edge_connectivity(spark):
    from graftlink.flow import st_edge_connectivity

    pairs = [(0, 1), (1, 4), (0, 2), (2, 4), (0, 3), (3, 4), (1, 2)]
    g = nx.DiGraph(pairs)
    want = nx.edge_connectivity(g, 0, 4)
    got = st_edge_connectivity(edges_df(spark, pairs), 0, 4)
    assert got == pytest.approx(float(want)) and got == 3.0


def test_st_vertex_connectivity(spark):
    from graftlink.flow import st_vertex_connectivity

    # two internally disjoint 0->5 paths through {1,2} and {3,4},
    # plus a chord 1->3 that adds no third disjoint path
    pairs = [(0, 1), (1, 2), (2, 5), (0, 3), (3, 4), (4, 5), (1, 3)]
    g = nx.DiGraph(pairs)
    want = nx.node_connectivity(g, 0, 5)
    got = st_vertex_connectivity(edges_df(spark, pairs), 0, 5)
    assert got == pytest.approx(float(want)) and got == 2.0


def test_st_vertex_connectivity_random_parity(spark):
    from graftlink.flow import st_vertex_connectivity

    rng = np.random.RandomState(3)
    n = 14
    triples = [
        (i, j)
        for i in range(n)
        for j in range(n)
        if i != j and rng.rand() < 0.18
    ]
    g = nx.DiGraph(triples)
    s, t = 0, n - 1
    if g.has_edge(s, t):
        g.remove_edge(s, t)
        triples = [p for p in triples if p != (s, t)]
    g.add_nodes_from([s, t])
    want = nx.node_connectivity(g, s, t)
    got = st_vertex_connectivity(edges_df(spark, triples), s, t)
    assert got == pytest.approx(float(want))


def test_st_vertex_connectivity_adjacent_raises(spark):
    from graftlink.flow import st_vertex_connectivity

    with pytest.raises(ValueError):
        st_vertex_connectivity(edges_df(spark, [(0, 1)]), 0, 1)
