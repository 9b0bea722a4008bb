"""Negative-weight Bellman-Ford (sssp_weighted allow_negative=True)
and maximin widest paths: parity vs networkx / brute-force oracles,
negative-cycle detection, and conventions (inf at source, unreachable
absent)."""

from __future__ import annotations

import networkx as nx
import pytest

from graftlink.paths import sssp_weighted, widest_path_widths
from tests.oracles import er_edges


def _potential_weights(pairs):
    """w(u,v) = (u%7 + v%3) + phi(u) - phi(v), phi(x) = 2*(x%11):
    genuinely negative edges, provably no negative cycle (cycle weight
    telescopes to the non-negative base sum)."""
    return [
        (u, v, float(u % 7 + v % 3 + 2 * (u % 11) - 2 * (v % 11)))
        for u, v in pairs
    ]


def test_negative_weights_match_networkx(spark):
    trip = _potential_weights(er_edges(30, 0.15, 3))
    assert any(w < 0 for _, _, w in trip), "fixture must contain negative edges"
    e = spark.createDataFrame(trip, "src long, dst long, weight double")
    got = {r.id: r.dist for r in sssp_weighted(e, source=0, allow_negative=True).collect()}
    g = nx.DiGraph()
    g.add_weighted_edges_from(trip)
    want = nx.single_source_bellman_ford_path_length(g, 0)
    assert set(got) == set(want)
    for v, d in want.items():
        assert got[v] == pytest.approx(d, abs=1e-9)


def test_negative_cycle_raises(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, -5.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    with pytest.raises(ValueError, match="negative cycle"):
        sssp_weighted(e, source=0, allow_negative=True)


def test_negative_weights_without_flag_unchanged(spark):
    """allow_negative=False keeps the documented non-negative contract
    and behavior on ordinary inputs."""
    trip = [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 10.0)]
    e = spark.createDataFrame(trip, "src long, dst long, weight double")
    got = {r.id: r.dist for r in sssp_weighted(e, source=0).collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 5.0}


def _brute_widest(trip, source):
    g = nx.DiGraph()
    for u, v, w in trip:
        if not g.has_edge(u, v) or g[u][v]["weight"] < w:
            g.add_edge(u, v, weight=w)
    best = {source: float("inf")}
    for t in g.nodes:
        if t == source:
            continue
        wmax = None
        for path in nx.all_simple_paths(g, source, t):
            wmin = min(
                g[a][b]["weight"] for a, b in zip(path, path[1:])
            )
            wmax = wmin if wmax is None else max(wmax, wmin)
        if wmax is not None:
            best[t] = wmax
    return best


def test_widest_matches_bruteforce(spark):
    pairs = er_edges(10, 0.3, 5)
    trip = [(u, v, float(u % 7 + v % 3 + 1)) for u, v in pairs]
    e = spark.createDataFrame(trip, "src long, dst long, weight double")
    got = {r.id: r.width for r in widest_path_widths(e, source=0).collect()}
    want = _brute_widest(trip, 0)
    assert got == want


def test_widest_conventions(spark):
    e = spark.createDataFrame(
        [(0, 1, 3.0), (1, 2, 1.0), (0, 2, 2.0), (5, 6, 9.0)],
        "src long, dst long, weight double",
    )
    got = {r.id: r.width for r in widest_path_widths(e, source=0).collect()}
    assert got[0] == float("inf")
    assert got[1] == 3.0
    assert got[2] == 2.0  # direct 2.0 beats 0->1->2 bottleneck 1.0
    assert 5 not in got and 6 not in got  # unreachable absent
