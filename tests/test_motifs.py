"""Order-4 motif census: Spark closed-form inversion AND the DuckDB
direct-enumeration twin, each against brute-force induced-subgraph
enumeration over all C(n,4) vertex subsets."""

from __future__ import annotations

from itertools import combinations

import duckdb
import networkx as nx
import pytest

from graftlink.motifs import MOTIFS, motif_census_4, motif_census_sql
from tests.conftest import edges_df
from tests.oracles import er_edges, ring_of_cliques


def brute(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    counts = dict.fromkeys(MOTIFS, 0)
    for quad in combinations(sorted(g.nodes()), 4):
        sub = g.subgraph(quad)
        m = sub.number_of_edges()
        if m < 3 or not nx.is_connected(sub):
            continue
        maxdeg = max(d for _, d in sub.degree())
        if m == 6:
            counts["k4_clique"] += 1
        elif m == 5:
            counts["diamond"] += 1
        elif m == 4:
            counts["paw" if maxdeg == 3 else "c4_cycle"] += 1
        else:
            counts["star_k13" if maxdeg == 3 else "p4_path"] += 1
    return counts


def got_spark(spark, pairs):
    df = motif_census_4(edges_df(spark, pairs))
    return {r.motif: r["count"] for r in df.collect()}


def got_duck(pairs):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e(src BIGINT, dst BIGINT)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?)", [list(p) for p in pairs])
    rows = con.execute(motif_census_sql("SELECT src, dst FROM e")).fetchall()
    return dict(rows)


CASES = {
    "path": [(i, i + 1) for i in range(6)],
    "star": [(0, i) for i in range(1, 6)],
    "cycle4": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "paw": [(0, 1), (1, 2), (2, 0), (0, 3)],
    "diamond": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)],
    "k4": [(a, b) for a in range(4) for b in range(a + 1, 4)],
    "k5": [(a, b) for a in range(5) for b in range(a + 1, 5)],
    "ring_cliques": ring_of_cliques(3, 4),
    "petersen": list(nx.petersen_graph().edges()),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_fixture_parity(spark, name):
    pairs = CASES[name]
    want = brute(pairs)
    assert got_duck(pairs) == want
    assert got_spark(spark, pairs) == want


@pytest.mark.parametrize("seed", [3, 17, 59])
def test_er_parity(spark, seed):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(28, 0.18, seed)})
    want = brute(pairs)
    assert got_duck(pairs) == want
    assert got_spark(spark, pairs) == want


def test_direction_and_dups_ignored(spark):
    base = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 1)]
    noisy = base + [(1, 0), (2, 2), (0, 3)]
    assert got_spark(spark, noisy) == brute(base)
