"""Triangle counting parity (BASELINE.md row 7): exact global +
per-vertex vs networkx."""

import pytest

from graftlink.triangles import transitivity, triangle_count, triangles_per_vertex

from tests.conftest import edges_df
from tests.oracles import (
    er_edges,
    karate_edges,
    ring_edges,
    triangles_networkx,
    two_cliques_bridge,
)


def test_karate_45(spark):
    e = edges_df(spark, karate_edges())
    assert triangle_count(e) == 45


def test_ring_zero(spark):
    assert triangle_count(edges_df(spark, ring_edges(10))) == 0


def test_two_cliques_20(spark):
    assert triangle_count(edges_df(spark, two_cliques_bridge())) == 20


def test_direction_and_dupes_ignored(spark):
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 0)]
    assert triangle_count(edges_df(spark, pairs)) == 1


@pytest.mark.parametrize("seed", [5, 6])
def test_per_vertex_vs_networkx(spark, seed):
    n = 40
    pairs = er_edges(n, 0.12, seed)
    e = edges_df(spark, pairs)
    per, total = triangles_networkx(n, pairs)
    assert triangle_count(e) == total
    got = {
        r["id"]: r["triangles"]
        for r in triangles_per_vertex(e, e.sparkSession.range(n)).collect()
    }
    assert got == per


def test_transitivity_karate(spark):
    import networkx as nx

    e = edges_df(spark, karate_edges())
    want = nx.transitivity(nx.karate_club_graph())
    assert abs(transitivity(e) - want) < 1e-12
