"""Triad census parity vs networkx.triadic_census (exact, all 16
classes) on random digraphs. The DuckDB twin — a DIFFERENT
decomposition (direct connected-triple enumeration) — runs in the
driver contract."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from graftlink.triads import TRIAD_NAMES, triad_census

from tests.conftest import edges_df


def _er(n, m, seed):
    rnd = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            pairs.add((a, b))
    return sorted(pairs)


@pytest.mark.parametrize(
    "seed,n,m",
    [(1, 20, 60), (2, 40, 200), (3, 15, 90), (5, 30, 140)],
)
def test_triad_census_matches_networkx(spark, seed, n, m):
    pairs = _er(n, m, seed)
    G = nx.DiGraph(pairs)
    # our vertex universe is edge endpoints; fixtures must cover 0..n-1
    assert set(G.nodes) == set(range(n))
    want = nx.triadic_census(G)
    row = triad_census(edges_df(spark, pairs)).collect()[0]
    got = {name: row[f"t{name.lower()}"] for name in TRIAD_NAMES}
    assert got == want


def test_triad_census_hand_cases(spark):
    # pure 2-cycle on 3 vertices: one 102, rest of the triple classes 0
    row = triad_census(edges_df(spark, [(0, 1), (1, 0), (2, 3)])).collect()[0]
    # vertices {0,1,2,3}: C(4,3)=4 triples
    assert row.t102 == 2   # {0,1,2}, {0,1,3}
    assert row.t012 == 2   # {0,2,3}, {1,2,3}
    assert row.t003 == 0
    # directed 3-cycle
    row = triad_census(edges_df(spark, [(0, 1), (1, 2), (2, 0)])).collect()[0]
    assert row.t030c == 1 and row.t030t == 0
    # transitive triangle
    row = triad_census(edges_df(spark, [(0, 1), (1, 2), (0, 2)])).collect()[0]
    assert row.t030t == 1 and row.t030c == 0
    # complete mutual triangle
    pairs = [(a, b) for a in range(3) for b in range(3) if a != b]
    row = triad_census(edges_df(spark, pairs)).collect()[0]
    assert row.t300 == 1


def test_triad_census_total_is_n_choose_3(spark):
    pairs = _er(30, 120, seed=7)
    row = triad_census(edges_df(spark, pairs)).collect()[0]
    total = sum(row[f"t{name.lower()}"] for name in TRIAD_NAMES)
    assert total == 30 * 29 * 28 // 6
