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


# ---------------------------------------------------------------------------
# Leiden (move phase + singleton-merge refinement)
# ---------------------------------------------------------------------------


def leiden_labels(spark, pairs, **kw):
    from graftlink.louvain import leiden_communities
    from tests.conftest import edges_df

    return {
        r.id: r.community
        for r in leiden_communities(edges_df(spark, pairs), **kw).collect()
    }


def test_leiden_two_cliques_recovered(spark):
    got = leiden_labels(spark, two_cliques_bridge())
    assert len(set(got.values())) == 2
    assert {v for v, c in got.items() if c == got[0]} == {0, 1, 2, 3, 4}


def test_leiden_quality_at_least_louvain(spark):
    """The Leiden refinement must never cost modularity vs plain
    Louvain on the standard fixtures (round-2 VERDICT next #5)."""
    from graftlink.louvain import leiden_communities

    ring = []
    for c in range(4):
        base = c * 5
        ring += [(base + i, base + j) for i in range(5) for j in range(i + 1, 5)]
        ring.append((base + 4, ((c + 1) % 4) * 5))
    for pairs in (karate_edges(), two_cliques_bridge(), ring):
        e = edges_df(spark, pairs)
        q_leiden = modularity(e, leiden_communities(e))
        q_louvain = modularity(e, louvain_communities(e))
        assert q_leiden >= q_louvain - 1e-9, (q_leiden, q_louvain)


def test_leiden_communities_internally_connected(spark):
    """The Leiden guarantee: every returned community induces a
    CONNECTED subgraph (Louvain can emit disconnected ones). Checked
    on karate and a seeded ER graph via networkx."""
    import networkx as nx

    from tests.oracles import er_edges

    for pairs in (karate_edges(), er_edges(60, 0.08, seed=9)):
        got = leiden_labels(spark, pairs)
        g = nx.Graph(pairs)
        for c in set(got.values()):
            members = [v for v, cc in got.items() if cc == c and v in g]
            if len(members) > 1:
                assert nx.is_connected(g.subgraph(members)), (c, members)


def test_leiden_deterministic_across_partitioning(spark):
    pairs = karate_edges()
    a = leiden_labels(spark, pairs)
    from graftlink.louvain import leiden_communities

    b = {
        r.id: r.community
        for r in leiden_communities(edges_df(spark, pairs).repartition(7)).collect()
    }
    assert a == b


def test_leiden_refined_partition_refines_move_partition(spark):
    """_refine_phase output must be a strict refinement of the move
    partition: every refined community sits inside ONE move-phase
    community, and each is internally connected along intra-community
    edges."""
    import networkx as nx

    from pyspark.sql import functions as F

    from graftlink.louvain import _move_phase, _refine_phase, _und_weighted

    pairs = karate_edges()
    e = edges_df(spark, pairs)
    wedges = _und_weighted(e).localCheckpoint(eager=True)
    m2 = wedges.agg(F.sum(F.col("w") * 2)).collect()[0][0]
    P = _move_phase(wedges, 1.0, 20, m2)
    R = _refine_phase(wedges, P, 1.0, 20, m2)
    p = {r.id: r.c for r in P.collect()}
    q = {r.id: r.c for r in R.collect()}
    # refinement: same refined community -> same move community
    by_rc: dict = {}
    for v, rc in q.items():
        by_rc.setdefault(rc, []).append(v)
    g = nx.Graph(pairs)
    for rc, members in by_rc.items():
        assert len({p[v] for v in members}) == 1
        if len(members) > 1:
            assert nx.is_connected(g.subgraph(members))


def test_modularity_matches_networkx(spark):
    """The standalone modularity metric (igraph `modularity(membership)`
    surface, driver row modularity_lpa) vs networkx on an arbitrary
    fixed partition of a random graph."""
    import networkx as nx
    import pytest

    from tests.conftest import edges_df
    from tests.oracles import er_edges

    pairs = sorted({tuple(sorted(p)) for p in er_edges(40, 0.1, 23) if p[0] != p[1]})
    e = edges_df(spark, pairs)
    memb = e.sparkSession.createDataFrame(
        [(v, v % 4) for v in {x for p in pairs for x in p}],
        "id long, community long",
    )
    got = modularity(e, memb)
    g = nx.Graph(pairs)
    comms = [{v for v in g if v % 4 == c} for c in range(4)]
    want = nx.community.modularity(g, [c for c in comms if c])
    assert got == pytest.approx(want, abs=1e-12)
