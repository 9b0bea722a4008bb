"""Exact all-vertex eccentricity / radius / diameter vs networkx."""

from __future__ import annotations

import networkx as nx
import pytest

from graftlink.cycles import eccentricity_all, radius_diameter
from tests.conftest import edges_df
from tests.oracles import er_edges, ring_of_cliques


def nx_ecc(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    out = {}
    for comp in nx.connected_components(g):
        out.update(nx.eccentricity(g.subgraph(comp)))
    return out


def got(spark, pairs, roots=None):
    df = eccentricity_all(edges_df(spark, pairs), roots=roots)
    return {r.id: r.ecc for r in df.collect()}


def test_path_graph(spark):
    pairs = [(i, i + 1) for i in range(6)]
    assert got(spark, pairs) == nx_ecc(pairs)


def test_multi_component(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    assert got(spark, pairs) == nx_ecc(pairs)
    rd = radius_diameter(edges_df(spark, pairs)).collect()[0]
    assert (rd.radius, rd.diameter) == (1, 4)


@pytest.mark.parametrize("seed", [3, 17, 59])
def test_er_parity(spark, seed):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(40, 0.08, seed)})
    assert got(spark, pairs) == nx_ecc(pairs)


def test_ring_of_cliques(spark):
    pairs = ring_of_cliques(4, 4)
    want = nx_ecc(pairs)
    assert got(spark, pairs) == want
    rd = radius_diameter(edges_df(spark, pairs)).collect()[0]
    assert rd.radius == min(want.values())
    assert rd.diameter == max(want.values())


def test_sampled_roots_exact_for_those_centers(spark):
    pairs = [(i, i + 1) for i in range(8)]
    want = nx_ecc(pairs)
    sub = got(spark, pairs, roots=[0, 4])
    assert sub == {0: want[0], 4: want[4]}


def test_harmonic_all_vs_networkx(spark):
    from graftlink.cycles import harmonic_all

    pairs = sorted({tuple(sorted(p)) for p in er_edges(35, 0.09, 13)})
    got = {
        r.id: r.harmonic
        for r in harmonic_all(edges_df(spark, pairs)).collect()
    }
    g = nx.Graph()
    g.add_edges_from(pairs)
    want = nx.harmonic_centrality(g)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)


def test_harmonic_all_normalized_and_twin(spark):
    import duckdb

    from graftlink.cycles import harmonic_all, harmonic_all_sql

    pairs = [(0, 1), (1, 2), (2, 3), (10, 11)]  # disconnected
    raw = {
        r.id: r.harmonic
        for r in harmonic_all(edges_df(spark, pairs)).collect()
    }
    norm = {
        r.id: r.harmonic
        for r in harmonic_all(edges_df(spark, pairs), normalized=True).collect()
    }
    n = len(raw)
    for v in raw:
        assert norm[v] == pytest.approx(raw[v] / (n - 1), rel=1e-12)
    vals = ",".join(f"({a},{b})" for a, b in pairs)
    clean = (
        f"SELECT DISTINCT src, dst FROM (VALUES {vals}) t(src, dst) "
        "WHERE src <> dst"
    )
    orows = dict(duckdb.sql(harmonic_all_sql(clean)).fetchall())
    assert set(orows) == set(raw)
    for v in raw:
        assert orows[v] == pytest.approx(raw[v], rel=1e-12)
