"""Connected components parity (BASELINE.md row 5): exact membership
vs networkx after dense renumbering; both algorithms agree."""

import pytest

from graftlink.components import connected_components

from tests.conftest import edges_df
from tests.oracles import components_networkx, er_edges, karate_edges, ring_edges


def _run(spark, pairs, n, algo):
    e = edges_df(spark, pairs)
    verts = spark.range(n)
    res = connected_components(
        e, vertices=verts, algo=algo, checkpoint_mode="local"
    )
    return {r["id"]: r["component"] for r in res.collect()}


@pytest.mark.parametrize("algo", ["star", "minlabel"])
def test_karate_one_component(spark, algo):
    got = _run(spark, karate_edges(), 34, algo)
    assert got == {i: 0 for i in range(34)}


@pytest.mark.parametrize("algo", ["star", "minlabel"])
def test_multi_component_exact(spark, algo):
    # two rings + an isolate + a pair
    pairs = ring_edges(5) + [(a + 10, b + 10) for a, b in ring_edges(4)] + [(20, 21)]
    n = 25  # 22,23,24 isolated
    got = _run(spark, pairs, n, algo)
    want = components_networkx(n, pairs)
    assert got == want


@pytest.mark.parametrize("algo", ["star", "minlabel"])
@pytest.mark.parametrize("seed", [3, 4])
def test_er_exact(spark, algo, seed):
    n = 50
    pairs = er_edges(n, 0.02, seed)
    got = _run(spark, pairs, n, algo)
    want = components_networkx(n, pairs)
    assert got == want


def test_algorithms_agree_without_renumber(spark):
    pairs = er_edges(40, 0.03, 9)
    e = edges_df(spark, pairs)
    verts = spark.range(40)
    a = {
        r["id"]: r["component"]
        for r in connected_components(
            e, vertices=verts, algo="star", renumber=False
        ).collect()
    }
    b = {
        r["id"]: r["component"]
        for r in connected_components(
            e, vertices=verts, algo="minlabel", renumber=False,
            checkpoint_mode="local",
        ).collect()
    }
    assert a == b
    # labels are min-member ids
    for v, lab in a.items():
        assert lab <= v


def test_self_loops_and_dupes_harmless(spark):
    pairs = [(0, 0), (0, 1), (0, 1), (1, 2), (3, 3)]
    got = _run(spark, pairs, 4, "star")
    want = components_networkx(4, pairs)
    assert got == want
