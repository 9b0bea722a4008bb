"""igraph_neighborhood_size parity vs networkx ego balls."""

from __future__ import annotations

import networkx as nx
import pytest

from graftlink.metrics import neighborhood_size
from tests.conftest import edges_df
from tests.oracles import er_edges


def nx_sizes(pairs, order, directed=False):
    g = nx.DiGraph() if directed else nx.Graph()
    g.add_edges_from(pairs)
    return {
        v: len(nx.ego_graph(g, v, radius=order, undirected=not directed))
        for v in g.nodes()
    }


def got(spark, pairs, order, mode="all"):
    df = neighborhood_size(edges_df(spark, pairs), order=order, mode=mode)
    return {r.id: r.size for r in df.collect()}


def test_path_order2(spark):
    pairs = [(i, i + 1) for i in range(5)]
    assert got(spark, pairs, 2) == nx_sizes(pairs, 2)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_er_orders(spark, order):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(40, 0.06, 13)})
    assert got(spark, pairs, order) == nx_sizes(pairs, order)


def test_directed_out_and_in(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    assert got(spark, pairs, 2, "out") == nx_sizes(pairs, 2, directed=True)
    rev = [(b, a) for a, b in pairs]
    assert got(spark, pairs, 2, "in") == nx_sizes(rev, 2, directed=True)


def test_order0_is_self(spark):
    pairs = [(0, 1), (1, 2)]
    assert got(spark, pairs, 0) == {0: 1, 1: 1, 2: 1}


def test_approx_close_on_moderate_graph(spark):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(60, 0.08, 5)})
    exact = got(spark, pairs, 2)
    approx = {
        r.id: r.size
        for r in neighborhood_size(
            edges_df(spark, pairs), order=2, approx=True
        ).collect()
    }
    assert set(approx) == set(exact)
    for v, s in exact.items():
        assert abs(approx[v] - s) <= max(3, 0.15 * s)


def test_bad_mode_raises(spark):
    with pytest.raises(ValueError):
        neighborhood_size(edges_df(spark, [(0, 1)]), mode="diagonal")
