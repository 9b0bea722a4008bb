"""Burt constraint and nominal assortativity vs networkx."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from graftlink.linkpred import constraint
from graftlink.metrics import assortativity_nominal

from tests.conftest import edges_df


def _er(n, m, seed):
    rnd = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            pairs.add((a, b))
    return sorted(pairs)


@pytest.mark.parametrize("seed,n,m", [(1, 20, 60), (2, 35, 150)])
def test_constraint_matches_networkx(spark, seed, n, m):
    pairs = _er(n, m, seed)
    ref = nx.constraint(nx.Graph(pairs))
    got = {r.id: r.constraint
           for r in constraint(edges_df(spark, pairs)).collect()}
    assert set(got) == set(ref)
    for v, c in ref.items():
        assert abs(got[v] - c) < 1e-5, (v, got[v], c)


def test_constraint_star_center_vs_leaf(spark):
    # star: leaves are fully constrained (1.0), center is 1/n_leaves
    pairs = [(0, d) for d in range(1, 9)]
    got = {r.id: r.constraint
           for r in constraint(edges_df(spark, pairs)).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[0] == pytest.approx(8 * (1 / 8) ** 2)


def test_assortativity_nominal_matches_networkx(spark):
    pairs = _er(40, 200, seed=3)
    cat = {v: f"c{v % 3}" for v in range(40)}
    G = nx.DiGraph(pairs)
    nx.set_node_attributes(G, cat, "cat")
    want = nx.attribute_assortativity_coefficient(G, "cat")
    labels = spark.createDataFrame(
        [(v, c) for v, c in cat.items()], "id long, cat string"
    )
    got = assortativity_nominal(edges_df(spark, pairs), labels).collect()[0]
    assert got.assortativity == pytest.approx(want, abs=1e-5)


def test_assortativity_nominal_perfect(spark):
    # two disconnected same-category cliques: r = 1
    pairs = [(a, b) for a in range(3) for b in range(3) if a != b] + [
        (a, b) for a in range(3, 6) for b in range(3, 6) if a != b
    ]
    labels = spark.createDataFrame(
        [(v, "x" if v < 3 else "y") for v in range(6)], "id long, cat string"
    )
    got = assortativity_nominal(edges_df(spark, pairs), labels).collect()[0]
    assert got.assortativity == pytest.approx(1.0)
