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


# --- Barrat weighted clustering (round-4 verdict Missing #5) ---------

def _py_barrat(edge_weights: dict) -> dict:
    """Direct O(n * d^2) Barrat twin: edge_weights maps frozenset
    {u, v} -> w."""
    import itertools

    nbrs: dict = {}
    for (u, v), w in edge_weights.items():
        nbrs.setdefault(u, {})[v] = w
        nbrs.setdefault(v, {})[u] = w
    out = {}
    for i, nb in nbrs.items():
        k, s = len(nb), sum(nb.values())
        if k < 2:
            out[i] = 0.0
            continue
        num = 0.0
        for j, h in itertools.combinations(sorted(nb), 2):
            if h in nbrs.get(j, {}):
                num += nb[j] + nb[h]
        out[i] = round(num / (s * (k - 1)), 6) if num else 0.0
    return out


def test_barrat_python_twin_parity(spark):
    from graftlink.triangles import transitivity_barrat

    edges = er_edges(40, 0.15, 21)
    ew = {
        (min(a, b), max(a, b)): float(min(a, b) % 7 + max(a, b) % 3 + 1)
        for a, b in edges
        if a != b
    }
    rows = [(a, b, w) for (a, b), w in ew.items()]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = {
        r["id"]: r["barrat"]
        for r in transitivity_barrat(df, "weight").collect()
    }
    want = _py_barrat(ew)
    assert got == pytest.approx(want)


def test_barrat_uniform_weights_reduce_to_lcc(spark):
    """The paper's stated property: uniform weights give back the
    plain local clustering coefficient (networkx parity)."""
    import networkx as nx

    from graftlink.triangles import transitivity_barrat

    edges = er_edges(35, 0.18, 22)
    df = edges_df(spark, edges)
    got = {r["id"]: r["barrat"] for r in transitivity_barrat(df).collect()}
    g = nx.Graph()
    g.add_edges_from(edges)
    want = nx.clustering(g)
    for v, c in want.items():
        assert got[v] == pytest.approx(round(c, 6), abs=2e-6)


def test_barrat_duckdb_twin(spark):
    import duckdb

    from graftlink.triangles import transitivity_barrat, transitivity_barrat_sql
    from pyspark.sql import functions as F

    edges = sorted({(min(a, b), max(a, b)) for a, b in er_edges(30, 0.15, 23)})
    df = edges_df(spark, edges).select(
        "src", "dst",
        (F.least("src", "dst") % 7 + F.greatest("src", "dst") % 3 + 1)
        .cast("double").alias("weight"),
    )
    got = sorted(map(tuple, transitivity_barrat(df, "weight").collect()))
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    con = duckdb.connect()
    want = sorted(
        con.execute(
            transitivity_barrat_sql(
                f"SELECT * FROM (VALUES {vals}) AS t(src, dst)",
                "a % 7 + b % 3 + 1",
            )
        ).fetchall()
    )
    assert got == want
