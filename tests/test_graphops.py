"""Value tests for graph-structure utilities (graphops.py) against
Python set algebra. DuckDB twins run in the driver contract."""

from __future__ import annotations

import collections
import random

from graftlink.graphops import (
    contract_vertices,
    graph_difference,
    graph_intersection,
    graph_union,
    induced_subgraph,
)

from tests.conftest import edges_df


def _er(n, m, seed):
    rnd = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            pairs.add((a, b))
    return pairs


def test_induced_subgraph(spark):
    pairs = _er(40, 200, 1)
    keep = {v for v in range(40) if v % 3 == 0}
    want = {(a, b) for a, b in pairs if a in keep and b in keep}
    vdf = spark.createDataFrame([(v,) for v in sorted(keep)], "id long")
    got = {
        (r.src, r.dst)
        for r in induced_subgraph(edges_df(spark, pairs), vdf).collect()
    }
    assert got == want


def test_contract_vertices_weights(spark):
    pairs = _er(30, 150, 2)
    g = lambda v: v % 4
    want = collections.Counter(
        (g(a), g(b)) for a, b in pairs if g(a) != g(b)
    )
    mdf = spark.createDataFrame(
        [(v, g(v)) for v in range(30)], "id long, group long"
    )
    got = {
        (r.src, r.dst): r.weight
        for r in contract_vertices(edges_df(spark, pairs), mdf).collect()
    }
    assert got == dict(want)


def test_set_algebra(spark):
    a, b = _er(25, 90, 3), _er(25, 90, 4)
    da, db = edges_df(spark, a), edges_df(spark, b)
    assert {(r.src, r.dst) for r in graph_union(da, db).collect()} == a | b
    assert {
        (r.src, r.dst) for r in graph_intersection(da, db).collect()
    } == a & b
    assert {
        (r.src, r.dst) for r in graph_difference(da, db).collect()
    } == a - b


def test_graph_predicates(spark):
    from graftlink.graphops import graph_predicates

    # loops, a multi-edge, two components
    rows = [(0, 1), (1, 2), (0, 1), (2, 2), (3, 4)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = graph_predicates(df).collect()[0]
    assert got.n_vertices == 5 and got.n_edges == 5
    assert got.n_self_loops == 1 and got.n_multi_edges == 1
    assert not got.is_simple and not got.is_weakly_connected
    # simple connected graph
    got2 = graph_predicates(
        spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    ).collect()[0]
    assert got2.is_simple and got2.is_weakly_connected


def test_graph_predicates_twin(spark):
    import duckdb
    from graftlink.graphops import graph_predicates, graph_predicates_sql

    rows = [(0, 1), (1, 2), (0, 1), (2, 2), (3, 4), (4, 0)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = tuple(graph_predicates(df).collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", rows)
    want = con.execute(graph_predicates_sql("SELECT src, dst FROM e")).fetchall()[0]
    assert got == tuple(want)
