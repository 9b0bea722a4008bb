"""Deterministic parallel Louvain: structure recovery + modularity
quality vs LPA + determinism across partitioning."""

from __future__ import annotations

from graftlink.louvain import louvain_communities, modularity
from graftlink.lpa import label_propagation
from tests.conftest import edges_df
from tests.oracles import karate_edges, two_cliques_bridge


def labels_of(df):
    return {r.id: r.community for r in df.collect()}


def test_two_cliques_recovered(spark):
    e = edges_df(spark, two_cliques_bridge())
    got = labels_of(louvain_communities(e))
    # exactly two communities, split at the bridge (K5 | K5)
    assert len(set(got.values())) == 2
    assert {v for v, c in got.items() if c == got[0]} == {0, 1, 2, 3, 4}
    assert {v for v, c in got.items() if c == got[5]} == {5, 6, 7, 8, 9}


def test_karate_quality_beats_lpa(spark):
    e = edges_df(spark, karate_edges())
    lou = louvain_communities(e)
    lpa = label_propagation(e, checkpoint_mode="local").withColumnRenamed(
        "community", "community"
    )
    q_lou = modularity(e, lou)
    q_lpa = modularity(e, lpa)
    assert q_lou >= q_lpa - 1e-9
    assert q_lou > 0.3  # known-good range for karate partitions


def test_deterministic_across_partitioning(spark):
    pairs = karate_edges()
    a = labels_of(louvain_communities(edges_df(spark, pairs)))
    b = labels_of(
        louvain_communities(edges_df(spark, pairs).repartition(7))
    )
    assert a == b


def test_ring_of_cliques_modularity(spark):
    # 4 cliques of 5, ring-bridged — canonical Louvain fixture
    pairs = []
    for c in range(4):
        base = c * 5
        pairs += [(base + i, base + j) for i in range(5) for j in range(i + 1, 5)]
        pairs.append((base + 4, ((c + 1) % 4) * 5))
    e = edges_df(spark, pairs)
    got = labels_of(louvain_communities(e))
    assert len(set(got.values())) == 4
    for c in range(4):
        assert len({got[c * 5 + i] for i in range(5)}) == 1
    assert modularity(e, louvain_communities(e)) > 0.6
