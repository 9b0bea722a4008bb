"""igraph_girth parity: Spark batched-BFS + sigma-guard formulation
vs networkx.girth, plus the algorithm-independent DuckDB removal twin."""

from __future__ import annotations

import math

import duckdb
import networkx as nx
import pytest

from graftlink.cycles import girth, girth_sql
from tests.conftest import edges_df
from tests.oracles import er_edges, ring_of_cliques


def nx_girth(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    v = nx.girth(g)
    return None if v == math.inf else int(v)


def got(spark, pairs, roots=None):
    return girth(edges_df(spark, pairs), roots=roots).collect()[0]["girth"]


def duck(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE base_edges(src BIGINT, dst BIGINT)")
    con.executemany(
        "INSERT INTO base_edges VALUES (?, ?)", [list(p) for p in pairs]
    )
    return con.execute(
        girth_sql("SELECT src, dst FROM base_edges", 20)
    ).fetchall()[0][0]


CASES = {
    "triangle_tail": [(0, 1), (1, 2), (2, 0), (2, 3)],
    "c5": [(i, (i + 1) % 5) for i in range(5)],
    "c6": [(i, (i + 1) % 6) for i in range(6)],
    "c4_and_c6": [(0, 1), (1, 2), (2, 3), (3, 0)]
    + [(10 + i, 10 + (i + 1) % 6) for i in range(6)],
    "tree": [(i, i + 1) for i in range(6)],
    "petersen": list(nx.petersen_graph().edges()),
    "ring_cliques": ring_of_cliques(4, 4),
    "two_comp_tree_plus_c7": [(0, 1), (1, 2)]
    + [(10 + i, 10 + (i + 1) % 7) for i in range(7)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_fixture_parity(spark, name):
    pairs = CASES[name]
    want = nx_girth(pairs)
    assert got(spark, pairs) == want
    assert duck(pairs) == want


@pytest.mark.parametrize("seed", [3, 17, 59])
def test_er_parity(spark, seed):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(36, 0.06, seed)})
    want = nx_girth(pairs)
    assert got(spark, pairs) == want
    assert duck(pairs) == want


def test_self_loop_and_parallel(spark):
    assert got(spark, [(0, 1), (1, 1)]) == 1
    assert got(spark, [(0, 1), (1, 0), (1, 2)]) == 2


def test_sampled_roots_upper_bound(spark):
    # c4 + far c6: a root on the c6 only sees its own cycle exactly,
    # plus valid candidates for the other component only if reachable
    pairs = CASES["c4_and_c6"]
    ub = got(spark, pairs, roots=[10])
    assert ub == 6  # exact for the component containing the root
    assert got(spark, pairs) == 4


def test_even_girth_needs_sigma_guard(spark):
    # C4: from a root ON the cycle there is NO same-level edge; the
    # sigma>e guard is the only way the antipodal edge qualifies
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert got(spark, pairs) == 4
