"""igraph Graph.strength() parity vs networkx weighted degree."""

from __future__ import annotations

import networkx as nx
import pytest

from graftlink.vertices import strength


def make(spark, triples):
    rows = [(int(a), int(b), float(w)) for a, b, w in triples]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


TRIPLES = [(0, 1, 2.0), (1, 2, 0.5), (2, 0, 1.5), (2, 3, 4.0), (1, 0, 1.0)]


def test_all_matches_networkx_multigraph(spark):
    g = nx.MultiGraph()
    for a, b, w in TRIPLES:
        g.add_edge(a, b, weight=w)
    got = {
        r.id: r.strength
        for r in strength(make(spark, TRIPLES), weights="weight").collect()
    }
    want = dict(g.degree(weight="weight"))
    assert got == pytest.approx(want)


def test_directions(spark):
    e = make(spark, TRIPLES)
    out = {r.id: r.strength for r in strength(e, "weight", "out").collect()}
    inn = {r.id: r.strength for r in strength(e, "weight", "in").collect()}
    assert out == pytest.approx({0: 2.0, 1: 1.5, 2: 5.5})
    assert inn == pytest.approx({1: 2.0, 2: 0.5, 0: 2.5, 3: 4.0})


def test_unweighted_falls_back_to_degree(spark):
    e = make(spark, TRIPLES)
    got = {r.id: r.strength for r in strength(e).collect()}
    assert got == pytest.approx({0: 3.0, 1: 3.0, 2: 3.0, 3: 1.0})


def test_self_loop_counts_twice_in_all(spark):
    e = make(spark, [(0, 0, 3.0), (0, 1, 1.0)])
    got = {r.id: r.strength for r in strength(e, "weight").collect()}
    assert got == pytest.approx({0: 7.0, 1: 1.0})
    noloop = {
        r.id: r.strength
        for r in strength(e, "weight", loops=False).collect()
    }
    assert noloop == pytest.approx({0: 1.0, 1: 1.0})


def test_bad_direction_raises(spark):
    with pytest.raises(ValueError):
        strength(make(spark, TRIPLES), direction="up")
