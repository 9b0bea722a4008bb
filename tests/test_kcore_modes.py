"""Directed coreness (igraph coreness(mode="in"/"out")) vs the exact
sequential peeling oracle (min-degree removal — Batagelj–Zaveršnik
generalized core peeling, exact for any monotone degree notion)."""

from __future__ import annotations

import networkx as nx
import pytest

from graftlink.kcore import core_numbers
from tests.conftest import edges_df
from tests.oracles import er_edges


def peel_oracle(pairs, mode):
    """core(v) under in/out-degree peeling, exact."""
    edges = {(a, b) for a, b in pairs if a != b}
    nodes = {v for e in edges for v in e}
    core = {}
    k = 0
    while nodes:
        if mode == "in":
            deg = {v: sum(1 for (a, b) in edges if b == v) for v in nodes}
        else:
            deg = {v: sum(1 for (a, b) in edges if a == v) for v in nodes}
        v = min(nodes, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        nodes.discard(v)
        edges = {(a, b) for (a, b) in edges if a != v and b != v}
    return core


def got(spark, pairs, mode):
    df = core_numbers(edges_df(spark, pairs), mode=mode)
    return {r.id: r.core for r in df.collect()}


def test_directed_cycle_in_core_1(spark):
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    assert got(spark, pairs, "in") == {v: 1 for v in range(6)}
    assert got(spark, pairs, "out") == {v: 1 for v in range(6)}


def test_star_out_vs_in(spark):
    # hub -> leaves: every vertex has in-deg <= 1 and out-deg <= n
    pairs = [(0, i) for i in range(1, 6)]
    assert got(spark, pairs, "in") == peel_oracle(pairs, "in")
    assert got(spark, pairs, "out") == peel_oracle(pairs, "out")


def test_bidirected_clique_matches_undirected(spark):
    n = 5
    pairs = [(a, b) for a in range(n) for b in range(n) if a != b]
    # fully bidirected K5: in-core = out-core = n-1 everywhere
    assert got(spark, pairs, "in") == {v: n - 1 for v in range(n)}
    assert got(spark, pairs, "out") == {v: n - 1 for v in range(n)}


@pytest.mark.parametrize("seed", [3, 17, 59])
@pytest.mark.parametrize("mode", ["in", "out"])
def test_er_parity_directed(spark, seed, mode):
    pairs = sorted(set(er_edges(40, 0.08, seed)))  # directed, keep direction
    assert got(spark, pairs, mode) == peel_oracle(pairs, mode)


def test_mode_all_unchanged_vs_networkx(spark):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(40, 0.1, 7)})
    g = nx.Graph()
    g.add_edges_from(pairs)
    assert got(spark, pairs, "all") == nx.core_number(g)


def test_bad_mode_raises(spark):
    with pytest.raises(ValueError):
        core_numbers(edges_df(spark, [(0, 1)]), mode="sideways")
