"""Voronoi communities (graftlink/voronoi.py) — spec parity vs a
pure-python twin, semantic fixtures, determinism."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graftlink.voronoi import (
    PACK,
    Q,
    local_relative_density,
    voronoi_communities,
    voronoi_seeds,
)
from tests.conftest import edges_df


def _python_voronoi(edges):
    """Pure-python twin of the module spec (same integer arithmetic)."""
    import heapq

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = sorted({v for e in edges for v in e})
    adj = {v: set() for v in verts}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in verts}
    tri = {}
    for v in verts:
        n = adj[v]
        tri[v] = sum(1 for a, b in und if a in n and b in n)
    q = {}
    for v in verts:
        w_int = deg[v] + tri[v]
        denom = sum(deg[u] for u in adj[v]) + deg[v] - w_int
        q[v] = (Q * w_int) // denom if denom > 0 else 0
    seeds = [
        v
        for v in verts
        if all(
            (q[u], -u) < (q[v], -v) if q[u] != q[v] else u > v
            for u in adj[v]
        )
    ]
    # dijkstra from all seeds with (dist, seed) lexicographic min
    best = {s: (0, s) for s in seeds}
    heap = [(0, s, s) for s in seeds]
    heapq.heapify(heap)
    while heap:
        d, seed, v = heapq.heappop(heap)
        if best.get(v, (1 << 60, 0)) < (d, seed):
            continue
        for u in adj[v]:
            nd = (d + 2 * Q + 1 - q[v] - q[u], seed)
            if nd < best.get(u, (1 << 60, 0)):
                best[u] = nd
                heapq.heappush(heap, (nd[0], seed, u))
    return {v: (s, d) for v, (d, s) in best.items()}


def _spark_voronoi(spark, edges):
    res = voronoi_communities(edges_df(spark, edges)).collect()
    return {r["id"]: (r["community"], r["dist"]) for r in res}


def test_two_cliques_split(spark):
    cl1 = [(i, j) for i in range(5) for j in range(5) if i < j]
    cl2 = [(i + 10, j + 10) for i in range(5) for j in range(5) if i < j]
    got = _spark_voronoi(spark, cl1 + cl2 + [(4, 10)])
    comms = {}
    for v, (c, _) in got.items():
        comms.setdefault(c, set()).add(v)
    assert sorted(map(sorted, comms.values())) == [
        [0, 1, 2, 3, 4],
        [10, 11, 12, 13, 14],
    ]


def test_python_twin_parity_er(spark):
    for seed in (3, 7, 11):
        rng = random.Random(seed)
        e = sorted(
            {(rng.randrange(40), rng.randrange(40)) for _ in range(140)}
        )
        e = [(a, b) for a, b in e if a != b]
        assert _spark_voronoi(spark, e) == _python_voronoi(e)


def test_python_twin_parity_ring_and_star(spark):
    ring = [(i, (i + 1) % 12) for i in range(12)]
    star = [(0, i) for i in range(1, 9)]
    for e in (ring, star):
        assert _spark_voronoi(spark, e) == _python_voronoi(e)


def test_seeds_are_local_maxima(spark):
    rng = random.Random(5)
    e = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(90)})
    e = [(a, b) for a, b in e if a != b]
    df = edges_df(spark, e)
    dens = local_relative_density(df)
    qv = {r["id"]: r["q"] for r in dens.collect()}
    seeds = {r["id"] for r in voronoi_seeds(df).collect()}
    adj = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in qv:
        is_max = all(
            (qv[u] < qv[v]) or (qv[u] == qv[v] and u > v)
            for u in adj.get(v, ())
        )
        assert (v in seeds) == is_max
    # every vertex was assigned (every component has a seed)
    assigned = voronoi_communities(df).count()
    assert assigned == len(qv)


def test_every_community_contains_its_seed(spark):
    rng = random.Random(13)
    e = sorted({(rng.randrange(50), rng.randrange(50)) for _ in range(160)})
    e = [(a, b) for a, b in e if a != b]
    got = _spark_voronoi(spark, e)
    for v, (c, d) in got.items():
        if v == c:
            assert d == 0  # the seed is at distance 0 of itself
    assert {c for c, _ in got.values()} <= set(got)


def test_deterministic_across_partitioning(spark):
    rng = random.Random(21)
    e = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
    e = [(a, b) for a, b in e if a != b]
    df1 = edges_df(spark, e).repartition(1)
    df7 = edges_df(spark, e).repartition(7)
    r1 = sorted(map(tuple, voronoi_communities(df1).collect()))
    r7 = sorted(map(tuple, voronoi_communities(df7).collect()))
    assert r1 == r7


def test_pack_headroom():
    # dist accumulates at most (2Q+1) per hop; PACK must dominate ids
    assert PACK > 10**9  # fixture/test id spaces
    assert (2 * Q + 1) * 10**4 * PACK < 2**63  # 10k-hop diameter headroom


def test_voronoi_resume_exact(spark, tmp_path):
    from graftlink.checkpoint import fingerprint_edges

    ring = [(i, (i + 1) % 20) for i in range(20)]  # 11 rounds to converge
    e = edges_df(spark, ring)
    fp = fingerprint_edges(e)

    def cells(df):
        return {r.id: (r.community, r.dist) for r in df.collect()}

    full = cells(
        voronoi_communities(
            e, checkpoint_dir=str(tmp_path / "f"), fingerprint=fp
        )
    )
    d = str(tmp_path / "k")
    with pytest.raises(RuntimeError):
        voronoi_communities(e, max_rounds=3, checkpoint_dir=d, fingerprint=fp)
    resumed = cells(
        voronoi_communities(
            e, checkpoint_dir=d, resume=True, fingerprint=fp
        )
    )
    assert full == resumed  # integer state: exactly equal
