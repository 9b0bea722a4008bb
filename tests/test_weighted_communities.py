"""weights= for the community family (igraph community_multilevel /
community_leiden / community_infomap / community_walktrap weight
vectors): a fixture where the explicit weights FLIP the optimal
partition relative to the unweighted multiplicity view.

Fixture: two triangles T1={0,1,2}, T2={3,4,5} with unit-weight
internal edges, plus a heavy (w=10) perfect matching (0,3),(1,4),(2,5)
across them.  Unweighted, the triangles are the communities
(Q_tri = +0.5 with unit weights ignored... computed on counts);
weighted, each heavy pair is a community:
  m = 6*1 + 3*10 = 36, every vertex k = 12, pair k_c = 24
  Q_pairs = 3 * (10/36 - (24/72)^2) = 0.5
  Q_tri   = 2 * (3/36  - (36/72)^2) = -1/3   (two triangle communities)
"""

from __future__ import annotations

import pytest

from graftlink.infomap import infomap_communities
from graftlink.louvain import leiden_communities, louvain_communities, modularity
from graftlink.walktrap import walktrap_communities
from tests.conftest import edges_df


def _fixture(spark):
    tri = []
    for base in (0, 3):
        for i in range(base, base + 3):
            for j in range(i + 1, base + 3):
                tri.append((i, j, 1.0))
    cross = [(0, 3, 10.0), (1, 4, 10.0), (2, 5, 10.0)]
    return spark.createDataFrame(tri + cross, "src long, dst long, weight double")


def labels_of(df):
    return {r.id: r.community for r in df.collect()}


def _groups(lab):
    inv = {}
    for v, c in lab.items():
        inv.setdefault(c, set()).add(v)
    return sorted(map(frozenset, inv.values()), key=min)


PAIRS = [frozenset({0, 3}), frozenset({1, 4}), frozenset({2, 5})]
TRIS = [frozenset({0, 1, 2}), frozenset({3, 4, 5})]


@pytest.mark.parametrize(
    "algo",
    [louvain_communities, leiden_communities, infomap_communities],
    ids=["louvain", "leiden", "infomap"],
)
def test_weights_flip_partition(spark, algo):
    e = _fixture(spark)
    unw = _groups(labels_of(algo(e)))
    wtd = _groups(labels_of(algo(e, weights="weight")))
    # unweighted never sees the heavy pairs (modularity optimizers find
    # the triangles; infomap's codelength optimum on this tiny dense
    # graph is one module — either way, NOT the pairs)
    assert unw != PAIRS, f"unweighted must not find the pairs, got {unw}"
    assert wtd == PAIRS, f"weighted should find heavy pairs, got {wtd}"


def test_weights_flip_partition_walktrap(spark):
    """Walktrap's t-step walk distance (even t) makes tightly-coupled
    heavy PAIRS oscillate — P^4 from each endpoint concentrates back on
    its own side, so r^2(heavy partner) > r^2(triangle mate) and the
    pairs partition never enters the dendrogram (measured: 0.0288 vs
    0.0249 on the fixture above; igraph's weighted walktrap shares the
    distance, so it behaves identically).  The semantics-appropriate
    weighted fixture for walk distances is heavy TRIANGLES inside K6:
    intra-{0,1,2} and intra-{3,4,5} edges at w=10, all 9 cross edges at
    w=1.  Unweighted, K6 is edge-transitive (no community signal);
    weighted, walkers mix within the heavy triangles.  Gate = exact
    parity vs the weighted numpy twin + heavy-triangle recovery."""
    from tests.test_walktrap import partition_of, py_walktrap

    triples = []
    for base in (0, 3):
        for i in range(base, base + 3):
            for j in range(i + 1, base + 3):
                triples.append((i, j, 10.0))
    for i in range(0, 3):
        for j in range(3, 6):
            triples.append((i, j, 1.0))
    e = spark.createDataFrame(triples, "src long, dst long, weight double")
    got = _groups(labels_of(walktrap_communities(e, weights="weight")))
    assert got == TRIS, f"weighted walktrap should find heavy triangles, got {got}"
    # exact spec parity against the weighted dense numpy twin
    assert set(map(frozenset, got)) == py_walktrap(triples)
    # and the unweighted view of the same K6 cannot see the triangles
    # as *these specific* heavy groups beyond tie-break coincidence —
    # assert the weighted run used the weights: modularity of the
    # weighted partition under weights beats the unweighted-view cut.
    unw = _groups(labels_of(walktrap_communities(e)))
    q_w = modularity(e, spark.createDataFrame(
        [(v, min(g)) for g in got for v in g], "id long, community long"
    ), weights="weight")
    q_u = modularity(e, spark.createDataFrame(
        [(v, min(g)) for g in unw for v in g], "id long, community long"
    ), weights="weight")
    assert q_w >= q_u - 1e-12


def test_weighted_modularity_value(spark):
    e = _fixture(spark)
    pairs = spark.createDataFrame(
        [(0, 0), (3, 0), (1, 1), (4, 1), (2, 2), (5, 2)], "id long, community long"
    )
    tris = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)], "id long, community long"
    )
    assert modularity(e, pairs, weights="weight") == pytest.approx(0.5, abs=1e-12)
    assert modularity(e, tris, weights="weight") == pytest.approx(-1 / 3, abs=1e-12)
    # unweighted view of the same graph prefers the triangles
    assert modularity(e, tris) > modularity(e, pairs)


def test_weighted_deterministic_across_partitioning(spark):
    e = _fixture(spark)
    a = labels_of(louvain_communities(e, weights="weight"))
    b = labels_of(louvain_communities(e.repartition(7), weights="weight"))
    assert a == b
