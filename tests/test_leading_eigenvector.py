"""Leading-eigenvector community detection (Newman 2006 recursive
spectral bisection): partition parity vs a pure-Python twin of the
same round-12 trajectory spec, Newman's published karate result,
hybrid-vs-pure-distributed path equality, weighted flip, and
determinism across input partitioning."""

from __future__ import annotations

import math

import pytest

from graftlink.leading_eigenvector import (
    A1,
    C1,
    P,
    leading_eigenvector_communities,
)
from graftlink.louvain import modularity
from tests.conftest import edges_df
from tests.oracles import er_edges, karate_edges, ring_of_cliques, two_cliques_bridge


def py_leading_eigenvector(pairs, iters=100, max_levels=12):
    """Pure-Python twin of leading_eigenvector_communities' exact
    spec: poly-hash x0, per-step L2-normalize + round-12, block-of-10
    exact-fixpoint probe, unshifted phase + Gershgorin-shifted rerun
    when the Rayleigh quotient is non-positive, round-12 dQ guard.
    Returns the partition as a set of frozensets.

    `pairs` items are (u, v) with weight = multiplicity, or (u, v, w)
    with an explicit weight (parallel entries accumulate)."""
    und = {}
    for p in pairs:
        u, v, w = (p[0], p[1], p[2]) if len(p) == 3 else (p[0], p[1], 1.0)
        if u == v:
            continue
        key = tuple(sorted((u, v)))
        und[key] = und.get(key, 0.0) + float(w)
    adj = {}
    for (u, v), w in und.items():
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w
    verts = sorted(adj)
    k = {i: sum(adj[i].values()) for i in verts}
    m2 = 2 * sum(und.values()) or 1.0

    def rnorm(x):
        nn = math.sqrt(sum(v * v for v in x.values()))
        if nn > 0:
            return {i: round(v / nn, 12) for i, v in x.items()}
        return {i: round(v, 12) for i, v in x.items()}

    def power(V, adjg, fs):
        x = rnorm({i: ((i % P) * A1 + C1) % P / P - 0.5 for i in V})
        t = 0
        while t < iters:
            block = min(10, iters - t)
            for _ in range(block):
                prev = x
                s = sum(k[i] * x[i] for i in V)
                x = rnorm(
                    {
                        i: sum(w * x[j] for j, w in adjg[i].items())
                        - k[i] * s / m2
                        - fs[i] * x[i]
                        for i in V
                    }
                )
            t += block
            if max(abs(x[i] - prev[i]) for i in V) == 0.0:
                break
        return x

    final = []
    stack = [(verts, max_levels)]
    while stack:
        V, bud = stack.pop()
        if len(V) <= 1 or bud <= 0:
            final.append(frozenset(V))
            continue
        Vs = set(V)
        adjg = {i: {j: w for j, w in adj[i].items() if j in Vs} for i in V}
        dg = {i: sum(adjg[i].values()) for i in V}
        Kg = sum(k[i] for i in V)
        f = {i: dg[i] - k[i] * Kg / m2 for i in V}
        x = power(V, adjg, f)
        sx = sum(k[j] * x[j] for j in V)
        bx = {
            i: sum(w * x[j] for j, w in adjg[i].items())
            - k[i] * sx / m2
            - f[i] * x[i]
            for i in V
        }
        if sum(x[i] * bx[i] for i in V) <= 0:
            sigma = max(
                dg[i] + k[i] * Kg / m2 + abs(k[i] * k[i] / m2 + f[i]) for i in V
            ) + 0.1
            x = power(V, adjg, {i: f[i] - sigma for i in V})
        s = {i: 1.0 if x[i] >= 0 else -1.0 for i in V}
        ta = sum(w * s[i] * s[j] for i in V for j, w in adjg[i].items())
        ks = sum(k[i] * s[i] for i in V)
        tf = sum(f[i] for i in V)
        dq = round((ta - ks * ks / m2 - tf) / (2 * m2), 12)
        if dq > 0 and min(s.values()) < max(s.values()):
            stack.append((sorted(i for i in V if s[i] > 0), bud - 1))
            stack.append((sorted(i for i in V if s[i] <= 0), bud - 1))
        else:
            final.append(frozenset(V))
    return set(final)


def _partition(df):
    inv = {}
    for r in df.collect():
        inv.setdefault(r.community, set()).add(r.id)
    return {frozenset(v) for v in inv.values()}


@pytest.mark.parametrize(
    "pairs",
    [two_cliques_bridge(), ring_of_cliques(4, 5), er_edges(24, 0.25, 7)],
    ids=["two-cliques", "ring-of-cliques", "er24"],
)
def test_twin_parity(spark, pairs):
    e = edges_df(spark, pairs)
    got = _partition(leading_eigenvector_communities(e, iters=60))
    want = py_leading_eigenvector(pairs, iters=60)
    assert got == want


def test_karate_newman_published(spark):
    """Newman 2006 (PRE 74, 036104) reports 4 communities at
    Q = 0.3934 on Zachary's karate club; this spec reproduces the
    published value (and its partition) exactly at iters >= 80."""
    e = edges_df(spark, karate_edges())
    comm = leading_eigenvector_communities(e, iters=100)
    part = _partition(comm)
    assert len(part) == 4
    assert frozenset({0, 4, 5, 6, 10, 11, 16}) in part
    assert frozenset({23, 24, 25, 27, 28, 31}) in part
    q = modularity(e, comm)
    assert abs(q - 0.3934) < 5e-4
    assert part == py_leading_eigenvector(karate_edges(), iters=100)


def test_distributed_path_equals_hybrid(spark):
    """local_threshold=0 forces every level through the batched
    distributed superstep eigensolver; the round-12 grid makes its
    trajectory identical to the in-kernel numpy path."""
    e = edges_df(spark, two_cliques_bridge())
    hyb = {(r.id, r.community)
           for r in leading_eigenvector_communities(e, iters=30).collect()}
    dist = {(r.id, r.community)
            for r in leading_eigenvector_communities(
                e, iters=30, local_threshold=0).collect()}
    assert hyb == dist


def test_weights_flip_partition(spark):
    """Two unit triangles + heavy (w=10) cross matching: unweighted
    splits into the triangles, weighted must not (the heavy pairs
    dominate the modularity matrix)."""
    tri = []
    for base in (0, 3):
        for i in range(base, base + 3):
            for j in range(i + 1, base + 3):
                tri.append((i, j, 1.0))
    cross = [(0, 3, 10.0), (1, 4, 10.0), (2, 5, 10.0)]
    e = spark.createDataFrame(tri + cross, "src long, dst long, weight double")
    unw = _partition(leading_eigenvector_communities(e, iters=60))
    assert frozenset({0, 1, 2}) in unw and frozenset({3, 4, 5}) in unw
    wtd = _partition(
        leading_eigenvector_communities(e, iters=60, weights="weight")
    )
    assert frozenset({0, 1, 2}) not in wtd
    assert wtd == py_leading_eigenvector(tri + cross, iters=60)


def test_deterministic_across_partitioning(spark):
    pairs = er_edges(30, 0.2, 11)
    a = spark.createDataFrame(pairs, "src long, dst long").repartition(7)
    b = spark.createDataFrame(list(reversed(pairs)), "src long, dst long").repartition(2)
    la = sorted(
        (r.id, r.community)
        for r in leading_eigenvector_communities(a, iters=60).collect()
    )
    lb = sorted(
        (r.id, r.community)
        for r in leading_eigenvector_communities(b, iters=60).collect()
    )
    assert la == lb


def test_renumbered_dense_labels(spark):
    e = edges_df(spark, ring_of_cliques(4, 5))
    labs = {r.community for r in leading_eigenvector_communities(e, iters=60).collect()}
    assert labs == set(range(len(labs)))
