"""Maximal clique enumeration (degeneracy-owner Bron–Kerbosch over
cogrouped ego nets) vs networkx.find_cliques EXACT set parity, plus
the bounded-k DuckDB twins (maximal_cliques_sql / clique_number_sql).

Spark-side calls are the expensive part (~10s each even on 34
vertices: triangle listing + cogroup); the twin/clique-number grids
run DuckDB-vs-networkx only, and the Spark operator is exercised once
per behavior."""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest

from graftlink.cliques import (
    clique_number,
    clique_number_sql,
    largest_cliques,
    maximal_cliques,
    maximal_cliques_sql,
)

from tests.conftest import edges_df
from tests.oracles import er_edges, karate_edges, two_cliques_bridge

CASES = {
    "karate": karate_edges(),
    "er40": er_edges(40, 0.15, 7),
    "er25_dense": er_edges(25, 0.35, 11),
    "star_plus_tri": [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (3, 6)],
    "two_cliques_bridge": two_cliques_bridge(),
    "path": [(i, i + 1) for i in range(8)],
    "single_edge": [(5, 9)],
}


def nx_cliques(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    return sorted(tuple(sorted(c)) for c in nx.find_cliques(g))


def spark_cliques(spark, pairs, **kw):
    rows = maximal_cliques(edges_df(spark, pairs), **kw).collect()
    return sorted(tuple(r["members"]) for r in rows)


def duck_con(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE base_edges(src BIGINT, dst BIGINT)")
    con.executemany(
        "INSERT INTO base_edges VALUES (?, ?)", [list(p) for p in pairs]
    )
    return con


@pytest.mark.parametrize("name", sorted(CASES))
def test_networkx_parity(spark, name):
    pairs = CASES[name]
    assert spark_cliques(spark, pairs) == nx_cliques(pairs)


@pytest.mark.parametrize("name", sorted(CASES))
def test_sql_twins_vs_networkx(name):
    # DuckDB-only grid: the twin must agree with networkx on every
    # fixture independently of Spark (the driver then hash-compares
    # the two engines against each other)
    pairs = CASES[name]
    con = duck_con(pairs)
    got = sorted(
        (r[0], r[1])
        for r in con.execute(
            maximal_cliques_sql("SELECT src, dst FROM base_edges", k_max=8)
        ).fetchall()
    )
    want = sorted(
        (",".join(map(str, c)), len(c)) for c in nx_cliques(pairs)
    )
    assert got == want
    omega = max(len(c) for c in nx_cliques(pairs))
    osql = clique_number_sql("SELECT src, dst FROM base_edges", k_max=8)
    assert con.execute(osql).fetchall()[0][0] == omega


def test_clique_number_spark(spark):
    pairs = CASES["karate"]
    got = clique_number(edges_df(spark, pairs)).collect()[0]["clique_number"]
    assert got == max(len(c) for c in nx_cliques(pairs)) == 5


def test_size_filters_keep_maximality(spark):
    # igraph semantics: min/max filter the OUTPUT; a size-2 maximal
    # clique is not re-reported as its size-2 subsets of a triangle
    pairs = CASES["star_plus_tri"]
    all_c = nx_cliques(pairs)
    assert spark_cliques(spark, pairs, min_size=3) == sorted(
        c for c in all_c if len(c) >= 3
    )
    assert spark_cliques(spark, pairs, max_size=2) == sorted(
        c for c in all_c if len(c) <= 2
    )


def test_largest_cliques(spark):
    pairs = CASES["karate"]
    all_c = nx_cliques(pairs)
    mx = max(len(c) for c in all_c)
    want = sorted(c for c in all_c if len(c) == mx)
    rows = largest_cliques(edges_df(spark, pairs)).collect()
    got = sorted(tuple(r["members"]) for r in rows)
    assert got == want


def test_ownership_no_duplicates(spark):
    # every maximal clique emitted exactly once even with parallel /
    # reversed input edges
    pairs = CASES["er25_dense"]
    doubled = pairs + [(b, a) for a, b in pairs] + pairs[:10]
    assert spark_cliques(spark, doubled) == nx_cliques(pairs)


def test_max_group_raises(spark):
    star = [(0, i) for i in range(1, 30)]
    with pytest.raises(Exception, match="max_group"):
        maximal_cliques(edges_df(spark, star), max_group=10).collect()
