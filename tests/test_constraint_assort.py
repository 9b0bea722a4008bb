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


def test_diversity_entropy_replay(spark):
    import math

    from graftlink.metrics import diversity

    rows = [(0, 1, 2.0), (0, 2, 1.0), (0, 3, 1.0), (1, 2, 5.0), (4, 0, 3.0)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = {r.id: r.diversity for r in diversity(df).collect()}
    nbrs = {}
    for a, b, w in rows:
        nbrs.setdefault(a, {})[b] = nbrs.setdefault(a, {}).get(b, 0) + w
        nbrs.setdefault(b, {})[a] = nbrs.setdefault(b, {}).get(a, 0) + w
    for v, ws in nbrs.items():
        k = len(ws)
        if k < 2:
            want = 0.0
        else:
            s = sum(ws.values())
            h = -sum((w / s) * math.log(w / s) for w in ws.values())
            want = h / math.log(k)
        assert got[v] == round(want, 6), (v, got[v], want)


def test_diversity_uniform_weights_is_one(spark):
    # equal weights -> entropy is maximal -> diversity 1
    rows = [(0, d, 1.0) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    from graftlink.metrics import diversity

    got = {r.id: r.diversity for r in diversity(df).collect()}
    assert got[0] == 1.0
    assert all(got[d] == 0.0 for d in range(1, 6))
