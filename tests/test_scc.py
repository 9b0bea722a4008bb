"""Strong components parity vs networkx (exact after renumbering).

networkx oracle: strongly_connected_components of the same directed
simple graph; labels compared after both sides renumber components
dense 0..k-1 by ascending min member id.
"""

from __future__ import annotations

import networkx as nx
import pytest

from graftlink.scc import strongly_connected_components
from tests.conftest import edges_df
from tests.oracles import er_edges


def nx_scc_labels(n, pairs):
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    comps = sorted(min(c) for c in nx.strongly_connected_components(g))
    rank = {m: i for i, m in enumerate(comps)}
    out = {}
    for c in nx.strongly_connected_components(g):
        m = min(c)
        for v in c:
            out[v] = rank[m]
    return out


def run(spark, pairs, n):
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    df = strongly_connected_components(edges_df(spark, pairs), vertices=verts)
    return {r.id: r.component for r in df.collect()}


def test_two_cycles_and_bridge(spark):
    # 0->1->2->0 (SCC), 3->4->3 (SCC), bridge 2->3, tail 4->5
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (4, 5)]
    assert run(spark, pairs, 6) == nx_scc_labels(6, pairs)


def test_dag_all_singletons(spark):
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = run(spark, pairs, 5)
    assert got == nx_scc_labels(5, pairs)
    assert len(set(got.values())) == 5


def test_one_big_cycle(spark):
    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)]
    got = run(spark, pairs, n)
    assert got == nx_scc_labels(n, pairs)
    assert set(got.values()) == {0}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_er_digraph_exact(spark, seed):
    n = 40
    pairs = [(a, b) for a, b in er_edges(n, 0.06, seed) if a != b]
    assert run(spark, pairs, n) == nx_scc_labels(n, pairs)


def test_reciprocal_pairs(spark):
    # reciprocal edges form 2-SCCs; one-way edges do not merge
    pairs = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (4, 0)]
    assert run(spark, pairs, 5) == nx_scc_labels(5, pairs)
