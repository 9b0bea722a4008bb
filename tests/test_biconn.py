"""Tarjan–Vishkin biconnectivity parity vs networkx
(igraph_biconnected_components / igraph_articulation_points surface;
networkx computes both via the sequential DFS low-point pass the
distributed auxiliary-graph formulation replaces)."""

from __future__ import annotations

import networkx as nx
import pytest

from graftlink.biconn import (
    articulation_points,
    biconnected_components,
    vertex_block_counts,
)
from graftlink.bridges import bridges
from tests.conftest import edges_df
from tests.oracles import er_edges, ring_of_cliques


def nx_graph(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    return g


def nx_blocks(pairs):
    """frozenset of blocks, each a frozenset of canonical edges."""
    g = nx_graph(pairs)
    return {
        frozenset(tuple(sorted(e)) for e in comp)
        for comp in nx.biconnected_component_edges(g)
    }


def got_blocks(spark, pairs):
    df = biconnected_components(edges_df(spark, pairs))
    rows = df.collect()
    by_block: dict[int, set] = {}
    for r in rows:
        by_block.setdefault(r.block, set()).add((r.a, r.b))
    return {frozenset(v) for v in by_block.values()}, rows


def assert_parity(spark, pairs):
    got, rows = got_blocks(spark, pairs)
    assert got == nx_blocks(pairs)
    # block label = min non-root member vertex id: every label must be
    # an endpoint inside its own block
    by_block: dict[int, set] = {}
    for r in rows:
        by_block.setdefault(r.block, set()).update((r.a, r.b))
    for blk, members in by_block.items():
        assert blk in members
    aps = {r.id for r in articulation_points(edges_df(spark, pairs)).collect()}
    assert aps == set(nx.articulation_points(nx_graph(pairs)))


def test_path_every_inner_vertex_cuts(spark):
    pairs = [(i, i + 1) for i in range(6)]
    assert_parity(spark, pairs)


def test_cycle_single_block_no_aps(spark):
    pairs = [(i, (i + 1) % 8) for i in range(8)]
    got, _ = got_blocks(spark, pairs)
    assert got == nx_blocks(pairs)
    assert len(got) == 1
    aps = articulation_points(edges_df(spark, pairs)).collect()
    assert aps == []


def test_two_cliques_sharing_a_vertex(spark):
    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(3, 7) for b in range(a + 1, 7)]
    pairs = k1 + k2
    assert_parity(spark, pairs)
    aps = {
        r.id for r in articulation_points(edges_df(spark, pairs)).collect()
    }
    assert aps == {3}


def test_barbell(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    assert_parity(spark, pairs)


def test_ring_of_cliques(spark):
    assert_parity(spark, ring_of_cliques(4, 4))


def test_star_center_is_the_only_ap(spark):
    pairs = [(0, i) for i in range(1, 7)]
    assert_parity(spark, pairs)
    aps = {r.id for r in articulation_points(edges_df(spark, pairs)).collect()}
    assert aps == {0}


def test_multi_component_with_isolated_block_structures(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (10, 11), (11, 12), (20, 21)]
    assert_parity(spark, pairs)


@pytest.mark.parametrize("seed", [7, 23, 101, 404])
def test_er_parity(spark, seed):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(48, 0.04, seed)})
    assert_parity(spark, pairs)


def test_karate(spark):
    g = nx.karate_club_graph()
    assert_parity(spark, list(g.edges()))


def test_direction_multiplicity_self_loops_invariant(spark):
    base = [(0, 1), (1, 2), (0, 2), (2, 3)]
    noisy = base + [(1, 0), (2, 2), (3, 2)]
    got_b, _ = got_blocks(spark, base)
    got_n, _ = got_blocks(spark, noisy)
    assert got_b == got_n == nx_blocks(base)


def test_bridges_are_exactly_the_simple_singleton_blocks(spark):
    # internal consistency: an edge is a bridge iff it is alone in its
    # block and has multiplicity 1
    pairs = sorted({tuple(sorted(p)) for p in er_edges(40, 0.05, 5)})
    e = edges_df(spark, pairs)
    got, _ = got_blocks(spark, pairs)
    singleton = {next(iter(b)) for b in got if len(b) == 1}
    br = {(r.a, r.b) for r in bridges(e).collect()}
    assert br == singleton


def test_vertex_block_counts_equal_removal_statistic(spark):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(36, 0.06, 11)})
    g = nx_graph(pairs)
    got = {
        r.id: r.n_blocks
        for r in vertex_block_counts(edges_df(spark, pairs)).collect()
    }
    want = {}
    for v in g.nodes():
        h = g.copy()
        h.remove_node(v)
        comps = list(nx.connected_components(h)) if len(h) else []
        nbrs = set(g.neighbors(v))
        want[v] = sum(1 for c in comps if c & nbrs)
    assert got == want


def test_deterministic_across_partitioning(spark):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(40, 0.05, 9)})
    e = edges_df(spark, pairs)
    a = sorted(
        (r.a, r.b, r.block) for r in biconnected_components(e).collect()
    )
    b = sorted(
        (r.a, r.b, r.block)
        for r in biconnected_components(e.repartition(7)).collect()
    )
    assert a == b
