"""Graph metrics + k-core + weighted/personalized PageRank parity
vs networkx."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from graftlink.kcore import core_numbers, k_core
from graftlink.metrics import (
    degree_assortativity,
    degree_distribution,
    density,
    reciprocity,
)
from graftlink.pagerank import pagerank
from tests.conftest import edges_df
from tests.oracles import er_edges, karate_edges


@pytest.fixture(scope="module")
def karate(spark):
    pairs = karate_edges()
    return edges_df(spark, pairs + [(b, a) for a, b in pairs])


def nx_karate():
    return nx.karate_club_graph()


def test_density(spark, karate):
    row = density(karate).collect()[0]
    assert row.n_vertices == 34
    assert row.n_edges == 156  # 78 undirected edges, both directions
    assert row.density == pytest.approx(156 / (34 * 33), abs=1e-8)


def test_reciprocity(spark, karate):
    # both orientations present -> fully reciprocal
    assert reciprocity(karate).collect()[0].reciprocity == 1.0
    one_way = edges_df(spark, [(0, 1), (1, 2), (2, 1)])
    assert reciprocity(one_way).collect()[0].reciprocity == pytest.approx(2 / 3)


def test_degree_distribution(spark, karate):
    got = {r.degree: r.n_vertices for r in degree_distribution(karate, "all").collect()}
    want: dict[int, int] = {}
    for _, d in nx_karate().degree():
        want[2 * d] = want.get(2 * d, 0) + 1  # both orientations double it
    assert got == want


def test_degree_assortativity(spark, karate):
    got = degree_assortativity(karate).collect()[0].assortativity
    want = nx.degree_assortativity_coefficient(nx_karate())
    assert got == pytest.approx(want, abs=1e-6)


def test_k_core_karate(spark, karate):
    g = nx_karate()
    for k in (2, 3, 4):
        got = {r.id for r in k_core(karate, k).collect()}
        want = set(nx.k_core(g, k).nodes())
        assert got == want, f"k={k}"


def test_core_numbers_match_networkx(spark):
    pairs = er_edges(40, 0.12, 5)
    e = edges_df(spark, pairs)
    got = {r.id: r.core for r in core_numbers(e).collect()}
    g = nx.Graph(pairs)
    g.remove_edges_from(nx.selfloop_edges(g))
    want = nx.core_number(g)
    assert got == {k: want[k] for k in got}


def np_pagerank(n, weighted_pairs, d=0.85, p=None, iters=2000):
    """Dense numpy oracle: weighted + personalized power iteration
    (networkx semantics: dangling mass redistributed by p).
    networkx's own pagerank needs scipy, absent in this sandbox."""
    W = np.zeros((n, n))
    for a, b, w in weighted_pairs:
        W[a, b] += w
    out = W.sum(axis=1)
    p_vec = np.full(n, 1.0 / n) if p is None else np.asarray(p) / np.sum(p)
    r = p_vec.copy()
    T = np.divide(W, out[:, None], out=np.zeros_like(W), where=out[:, None] > 0)
    for _ in range(iters):
        dangling = r[out == 0].sum()
        r_new = (1 - d) * p_vec + d * (T.T @ r + dangling * p_vec)
        if np.abs(r_new - r).max() < 1e-14:
            return r_new
        r = r_new
    return r


def test_weighted_pagerank_vs_numpy_oracle(spark):
    pairs = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 0, 5.0),
             (1, 3, 1.5), (2, 3, 0.5)]
    e = spark.createDataFrame(pairs, "src long, dst long, weight double")
    got = {
        r.id: r.rank
        for r in pagerank(
            e, vertices=spark.range(4), weight_col="weight",
            checkpoint_mode="local", tol=1e-10, max_iter=200,
        ).collect()
    }
    want = np_pagerank(4, pairs)
    for k in range(4):
        assert got[k] == pytest.approx(want[k], abs=1e-6), k


def test_personalized_pagerank_vs_numpy_oracle(spark):
    pairs = karate_edges()
    both = pairs + [(b, a) for a, b in pairs]
    e = edges_df(spark, both)
    pers = spark.createDataFrame(
        [(0, 1.0), (33, 1.0)], "id long, p double"
    )
    got = {
        r.id: r.rank
        for r in pagerank(
            e, vertices=spark.range(34), personalization=pers,
            checkpoint_mode="local", tol=1e-10, max_iter=200,
        ).collect()
    }
    p = np.zeros(34)
    p[0] = p[33] = 1.0
    want = np_pagerank(34, [(a, b, 1.0) for a, b in both], p=p)
    for k in range(34):
        assert got[k] == pytest.approx(want[k], abs=1e-6), k


def test_weighted_uniform_equals_unweighted(spark):
    pairs = er_edges(30, 0.1, 3)
    e = edges_df(spark, pairs).withColumn("weight", F.lit(2.5))
    uw = {
        r.id: r.rank
        for r in pagerank(e, checkpoint_mode="local", tol=1e-10,
                          max_iter=100).collect()
    }
    w = {
        r.id: r.rank
        for r in pagerank(e, weight_col="weight", checkpoint_mode="local",
                          tol=1e-10, max_iter=100).collect()
    }
    got = np.array([w[k] for k in sorted(uw)])
    want = np.array([uw[k] for k in sorted(uw)])
    assert np.allclose(got, want, atol=1e-9)


def test_vertex_jaccard_similarity(spark):
    """sim(a,b) = |N(a) n N(b)| / |N(a) u N(b)| vs a brute-force
    python oracle on the karate club."""
    from graftlink.metrics import vertex_jaccard_similarity

    pairs = karate_edges()
    e = edges_df(spark, pairs)
    got = {(r.a, r.b): r.similarity
           for r in vertex_jaccard_similarity(e, min_common=1).collect()}
    nbrs: dict[int, set[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for (a, b), s in got.items():
        inter = len(nbrs[a] & nbrs[b])
        union = len(nbrs[a] | nbrs[b])
        assert inter >= 1
        assert s == pytest.approx(inter / union, abs=1e-8), (a, b)
    # completeness: every pair sharing a neighbor is present
    want_pairs = {
        (min(a, b), max(a, b))
        for a in nbrs for b in nbrs
        if a < b and nbrs[a] & nbrs[b]
    }
    assert set(got) == want_pairs


def test_bfs_distances_vs_networkx(spark):
    from graftlink.paths import bfs_distances

    pairs = er_edges(40, 0.08, 21)
    e = edges_df(spark, pairs)
    got = {r.id: r.dist
           for r in bfs_distances(e, source=pairs[0][0], directed=True).collect()}
    g = nx.DiGraph(pairs)
    want = nx.single_source_shortest_path_length(g, pairs[0][0])
    assert got == want
    # undirected view
    got_u = {r.id: r.dist
             for r in bfs_distances(e, source=pairs[0][0], directed=False).collect()}
    want_u = nx.single_source_shortest_path_length(g.to_undirected(), pairs[0][0])
    assert got_u == want_u
