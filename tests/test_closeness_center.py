"""Exact all-vertex closeness + graph center/periphery vs networkx
and the DuckDB twins."""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest

from graftlink.cycles import (
    center_periphery,
    center_periphery_sql,
    closeness_all,
    closeness_all_sql,
)
from tests.conftest import edges_df
from tests.oracles import er_edges, ring_of_cliques


def _clean(pairs):
    vals = ",".join(f"({a},{b})" for a, b in pairs)
    return (
        f"SELECT DISTINCT src, dst FROM (VALUES {vals}) t(src, dst) "
        "WHERE src <> dst"
    )


def nx_sum_reach(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    out = {}
    for v in g:
        d = nx.single_source_shortest_path_length(g, v)
        out[v] = (sum(d.values()), len(d) - 1)
    return out


@pytest.mark.parametrize("seed", [5, 23])
def test_closeness_vs_networkx(spark, seed):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(40, 0.07, seed)})
    rows = closeness_all(edges_df(spark, pairs)).collect()
    want = nx_sum_reach(pairs)
    assert {r.id: (r.sum_dist, r.reachable) for r in rows} == want
    for r in rows:
        assert r.closeness == pytest.approx(1.0 / want[r.id][0], rel=0)


def test_closeness_normalized_is_inverse_mean(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (10, 11)]  # disconnected
    raw = {r.id: r for r in closeness_all(edges_df(spark, pairs)).collect()}
    norm = {
        r.id: r
        for r in closeness_all(edges_df(spark, pairs), normalized=True).collect()
    }
    for v, r in raw.items():
        assert norm[v].closeness == pytest.approx(
            r.reachable / r.sum_dist, rel=0
        )


def test_closeness_twin(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    rows = {
        r.id: (r.sum_dist, r.reachable, r.closeness)
        for r in closeness_all(edges_df(spark, pairs)).collect()
    }
    orows = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(closeness_all_sql(_clean(pairs))).fetchall()
    }
    assert rows == orows  # exact, incl. the bit-identical division


def test_center_periphery_ring_of_cliques(spark):
    pairs = ring_of_cliques(4, 4)
    g = nx.Graph()
    g.add_edges_from(pairs)
    ecc = nx.eccentricity(g)
    r, d = min(ecc.values()), max(ecc.values())
    rows = {r_.id: r_ for r_ in center_periphery(edges_df(spark, pairs)).collect()}
    assert set(rows) == set(ecc)
    for v, e in ecc.items():
        assert rows[v].ecc == e
        assert rows[v].is_center == (e == r)
        assert rows[v].is_periphery == (e == d)


def test_center_periphery_twin(spark):
    pairs = [(i, i + 1) for i in range(6)] + [(20, 21)]
    rows = {
        r.id: (r.ecc, r.is_center, r.is_periphery)
        for r in center_periphery(edges_df(spark, pairs)).collect()
    }
    orows = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(center_periphery_sql(_clean(pairs))).fetchall()
    }
    assert rows == orows
