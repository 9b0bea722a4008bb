"""Bow-tie decomposition (Broder et al. 2000) + path-length stats.

Parity: hand-built fixture, a networkx-built reference of the same
taxonomy on random directed graphs, and the DuckDB SQL twin.
"""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest

from graftlink.bowtie import bowtie_decomposition, bowtie_sql
from graftlink.cycles import path_length_stats, path_length_stats_sql
from tests.conftest import edges_df
from tests.oracles import er_edges

FIXTURE = [
    (1, 2), (2, 3), (3, 1),            # CORE {1,2,3}
    (10, 1), (11, 10),                 # IN {10,11}
    (2, 20), (20, 21),                 # OUT {20,21}
    (10, 30), (30, 20),                # TUBE {30}
    (10, 40), (41, 20), (50, 40),      # TENDRIL {40,41,50}
    (60, 61),                          # DISCONNECTED {60,61}
]
FIXTURE_WANT = {
    1: "CORE", 2: "CORE", 3: "CORE",
    10: "IN", 11: "IN",
    20: "OUT", 21: "OUT",
    30: "TUBE",
    40: "TENDRIL", 41: "TENDRIL", 50: "TENDRIL",
    60: "DISCONNECTED", 61: "DISCONNECTED",
}


def nx_bowtie(pairs):
    """Reference taxonomy built with networkx primitives."""
    g = nx.DiGraph()
    g.add_edges_from(pairs)
    g.remove_edges_from(nx.selfloop_edges(g))
    sccs = list(nx.strongly_connected_components(g))
    core = max(sccs, key=lambda s: (len(s), -min(s)))
    rep = next(iter(core))
    fwd = nx.descendants(g, rep) | core
    bwd = nx.ancestors(g, rep) | core
    outv, inv = fwd - core, bwd - core
    h = g.subgraph(set(g) - core)
    from_in = set(inv)
    for v in inv:
        from_in |= nx.descendants(h, v)
    to_out = set(outv)
    for v in outv:
        to_out |= nx.ancestors(h, v)
    und = g.to_undirected()
    wcc = nx.node_connected_component(und, rep)
    out = {}
    for v in g:
        if v in core:
            out[v] = "CORE"
        elif v in outv:
            out[v] = "OUT"
        elif v in inv:
            out[v] = "IN"
        elif v in from_in and v in to_out:
            out[v] = "TUBE"
        elif v in wcc:
            out[v] = "TENDRIL"
        else:
            out[v] = "DISCONNECTED"
    return out


def spark_bowtie(spark, pairs):
    df = bowtie_decomposition(edges_df(spark, pairs))
    return {r.id: r.region for r in df.collect()}


def duck_bowtie(pairs):
    vals = ",".join(f"({a},{b})" for a, b in pairs)
    clean = (
        f"SELECT DISTINCT src, dst FROM (VALUES {vals}) t(src, dst) "
        "WHERE src <> dst"
    )
    return {r[0]: r[1] for r in duckdb.sql(bowtie_sql(clean)).fetchall()}


def test_fixture(spark):
    assert spark_bowtie(spark, FIXTURE) == FIXTURE_WANT


def test_fixture_sql_twin(spark):
    assert duck_bowtie(FIXTURE) == FIXTURE_WANT


@pytest.mark.parametrize("seed", [3, 17, 59, 101])
def test_er_directed_parity(spark, seed):
    # directed ER: keep pairs as generated (ordered), dedup
    pairs = sorted({(a, b) for a, b in er_edges(30, 0.06, seed) if a != b})
    want = nx_bowtie(pairs)
    assert spark_bowtie(spark, pairs) == want
    assert duck_bowtie(pairs) == want


def test_determinism(spark):
    pairs = sorted({(a, b) for a, b in er_edges(25, 0.08, 7) if a != b})
    assert spark_bowtie(spark, pairs) == spark_bowtie(spark, pairs)


def nx_path_stats(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    g.remove_edges_from(nx.selfloop_edges(g))
    n = g.number_of_nodes()
    dists = [
        d
        for _, dd in nx.all_pairs_shortest_path_length(g)
        for t, d in dd.items()
        if d > 0
    ]
    apl = sum(dists) / len(dists)
    geff = sum(1.0 / d for d in dists) / (n * (n - 1))
    return apl, geff, len(dists)


@pytest.mark.parametrize(
    "pairs",
    [
        [(i, i + 1) for i in range(6)],
        [(0, 1), (1, 2), (2, 3), (10, 11)],  # disconnected
    ],
)
def test_path_length_stats_vs_nx(spark, pairs):
    apl, geff, np_ = nx_path_stats(pairs)
    r = path_length_stats(edges_df(spark, pairs)).collect()[0]
    assert r.reachable_pairs == np_
    assert r.avg_path_length == pytest.approx(apl, abs=1e-12)
    assert r.global_efficiency == pytest.approx(geff, rel=1e-12)
    assert r.global_efficiency == pytest.approx(nx.global_efficiency(
        nx.Graph(pairs)), rel=1e-12)


@pytest.mark.parametrize("seed", [3, 59])
def test_path_length_stats_er_and_twin(spark, seed):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(30, 0.08, seed) if p[0] != p[1]})
    apl, geff, np_ = nx_path_stats(pairs)
    r = path_length_stats(edges_df(spark, pairs)).collect()[0]
    assert (r.reachable_pairs, r.avg_path_length) == (np_, pytest.approx(apl))
    assert r.global_efficiency == pytest.approx(geff, rel=1e-12)
    vals = ",".join(f"({a},{b})" for a, b in pairs)
    clean = (
        f"SELECT DISTINCT src, dst FROM (VALUES {vals}) t(src, dst) "
        "WHERE src <> dst"
    )
    o = duckdb.sql(path_length_stats_sql(clean)).fetchall()[0]
    assert o[0] == pytest.approx(r.avg_path_length, rel=1e-12)
    assert o[1] == pytest.approx(r.global_efficiency, rel=1e-12)
    assert o[2] == r.reachable_pairs


def test_path_length_stats_sampled_roots(spark):
    pairs = [(i, i + 1) for i in range(6)]
    # exact per-source rows from roots {0, 3}: distances along the path
    r = path_length_stats(edges_df(spark, pairs), roots=[0, 3]).collect()[0]
    d0 = [1, 2, 3, 4, 5, 6]
    d3 = [1, 1, 2, 2, 3, 3]
    dists = d0 + d3
    assert r.reachable_pairs == len(dists)
    assert r.avg_path_length == pytest.approx(sum(dists) / len(dists))
    assert r.global_efficiency == pytest.approx(
        sum(1 / d for d in dists) / (2 * 6), rel=1e-12
    )


def test_path_length_hist_vs_networkx(spark):
    from graftlink.cycles import path_length_hist
    from collections import Counter

    pairs = er_edges(30, 0.12, 9)
    g = nx.Graph(pairs)
    want = Counter(
        d
        for _, dd in nx.all_pairs_shortest_path_length(g)
        for d in dd.values()
        if d > 0
    )
    got = {r.dist: r.n_pairs for r in path_length_hist(edges_df(spark, pairs)).collect()}
    assert got == {d: c // 2 for d, c in want.items()}
    # halving must be exact: every ordered count even
    assert all(c % 2 == 0 for c in want.values())
