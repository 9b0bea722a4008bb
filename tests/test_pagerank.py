"""PageRank parity (BASELINE.md row 4): allclose 1e-6 vs numpy dense
power iteration @1e-12, cross-checked with networkx."""

import numpy as np
import pytest

from graftlink.pagerank import pagerank

from tests.conftest import edges_df
from tests.oracles import (
    dangling_chain,
    er_edges,
    karate_edges,
    pagerank_numpy,
    ring_edges,
    star_edges,
)


def _spark_ranks(spark, pairs, n, **kw):
    e = edges_df(spark, pairs)
    verts = spark.range(n).withColumnRenamed("id", "id")
    res = pagerank(e, vertices=verts, checkpoint_mode="local", **kw)
    got = {r["id"]: r["rank"] for r in res.collect()}
    return np.array([got[i] for i in range(n)])


def _assert_parity(spark, pairs, n, **kw):
    got = _spark_ranks(spark, pairs, n, **kw)
    want = pagerank_numpy(n, pairs)
    assert np.allclose(got, want, atol=1e-6), (got, want)
    assert abs(got.sum() - 1.0) < 1e-9
    return got


def test_karate(spark):
    # undirected: feed both directions
    pairs = karate_edges()
    both = pairs + [(b, a) for a, b in pairs]
    got = _assert_parity(spark, both, 34)
    # cross-check against the exact linear-system solve (independent
    # of power iteration)
    from tests.oracles import pagerank_exact

    assert np.allclose(got, pagerank_exact(34, both), atol=1e-6)


def test_ring_uniform(spark):
    n = 10
    got = _assert_parity(spark, ring_edges(n), n)
    assert np.allclose(got, np.full(n, 1.0 / n), atol=1e-9)


def test_star_closed_form(spark):
    _assert_parity(spark, star_edges(10), 11)


def test_dangling_mass(spark):
    _assert_parity(spark, dangling_chain(), 5)


def test_isolates_rank_floor(spark):
    # vertices 5,6 isolated: they are dangling, receive (1-d)/n + d*dangling/n
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4)]
    got = _spark_ranks(spark, pairs, 7)
    want = pagerank_numpy(7, pairs)
    assert np.allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("seed", [1, 2])
def test_er_vs_oracle(spark, seed):
    n = 40
    pairs = er_edges(n, 0.08, seed)
    _assert_parity(spark, pairs, n)


def test_chunked_adjacency_invariance(spark):
    """Hub-splitting (max_block) must not change results."""
    pairs = star_edges(30) + ring_edges(31)
    a = _spark_ranks(spark, pairs, 31, max_block=4)
    b = _spark_ranks(spark, pairs, 31, max_block=100_000)
    assert np.allclose(a, b, atol=1e-12)


def test_multi_edges_count_twice(spark):
    pairs = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]
    _assert_parity(spark, pairs, 3)


def test_scatter_engines_agree(spark):
    """jvm explode path == arrow kernel path, exactly the same update
    arithmetic — ranks agree to float-sum reorder noise."""
    import numpy as np

    from tests.conftest import edges_df
    from tests.oracles import er_edges

    e = edges_df(spark, er_edges(50, 0.08, 7))
    verts = spark.range(50)
    jvm = {
        r["id"]: r["rank"]
        for r in pagerank(e, vertices=verts, max_iter=10, tol=0.0,
                          checkpoint_mode="local", scatter_engine="jvm").collect()
    }
    arrow = {
        r["id"]: r["rank"]
        for r in pagerank(e, vertices=verts, max_iter=10, tol=0.0,
                          checkpoint_mode="local", scatter_engine="arrow").collect()
    }
    assert set(jvm) == set(arrow)
    got = np.array([jvm[k] for k in sorted(jvm)])
    want = np.array([arrow[k] for k in sorted(jvm)])
    assert np.allclose(got, want, atol=1e-12)
