"""Walktrap (random-walk Ward agglomeration, batched reciprocal-NN):
partition parity vs a numpy twin of the same specification,
planted-module recovery, modularity floor on karate, and determinism
across input partitioning."""

from __future__ import annotations

import numpy as np

from graftlink.louvain import modularity
from graftlink.walktrap import walktrap_communities
from tests.conftest import edges_df
from tests.oracles import karate_edges, ring_edges, two_cliques_bridge


def py_walktrap(pairs, steps=4, max_rounds=200):
    """Dense numpy twin of walktrap_communities' exact spec: t-step
    walk vectors, sum-vector state, ds rounded to 12 decimals, NN by
    lexicographic (ds, partner), reciprocal-pair batch merges with
    min-id labels, global-min fallback, max-modularity cut at round
    granularity. Returns the partition as a set of frozensets.

    `pairs` items are (u, v) with weight = multiplicity, or (u, v, w)
    with an explicit weight (parallel entries accumulate) — mirroring
    walktrap_communities(weights=...)."""
    und = {}
    for p in pairs:
        u, v, w = (p[0], p[1], p[2]) if len(p) == 3 else (p[0], p[1], 1.0)
        if u == v:
            continue
        key = tuple(sorted((u, v)))
        und[key] = und.get(key, 0.0) + float(w)
    verts = sorted({v for p in und for v in p})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for (u, v), w in und.items():
        A[idx[u], idx[v]] += w
        A[idx[v], idx[u]] += w
    d = A.sum(1)
    Pt = np.linalg.matrix_power(A / d[:, None], steps)
    invd = 1.0 / d
    m2 = d.sum()

    live = {i: Pt[i].copy() for i in range(n)}
    sizes = {i: 1 for i in range(n)}
    cw = {}
    for (u, v), w in und.items():
        a, b = sorted((idx[u], idx[v]))
        cw[(a, b)] = cw.get((a, b), 0.0) + w
    comm = {i: i for i in range(n)}

    def q_of():
        inw, k = {}, {}
        for (a, b), w in cw.items():
            if a == b:
                inw[a] = inw.get(a, 0.0) + w
                k[a] = k.get(a, 0.0) + 2 * w
            else:
                k[a] = k.get(a, 0.0) + w
                k[b] = k.get(b, 0.0) + w
        return sum(
            2 * inw.get(c, 0.0) / m2 - (k.get(c, 0.0) / m2) ** 2 for c in live
        )

    best_q, best = q_of(), dict(comm)
    for _ in range(max_rounds):
        adj = [(a, b) for (a, b) in cw if a != b]
        if not adj:
            break
        S = {c: float(np.sum(u * u * invd)) for c, u in live.items()}
        ds = {}
        for a, b in adj:
            x = float(np.sum(live[a] * live[b] * invd))
            na, nb = sizes[a], sizes[b]
            r2 = max(S[a] / na**2 + S[b] / nb**2 - 2 * x / (na * nb), 0.0)
            ds[(a, b)] = round(r2 * na * nb / (na + nb), 12)
        nn = {}
        for (a, b), v in ds.items():
            for c, o in ((a, b), (b, a)):
                if c not in nn or (v, o) < nn[c]:
                    nn[c] = (v, o)
        rec = [
            (c, nn[c][1])
            for c in nn
            if nn[nn[c][1]][1] == c and c < nn[c][1]
        ]
        if not rec:
            a, b = min(ds, key=lambda p: (ds[p], p))
            rec = [(a, b)]
        mm = {b: a for a, b in rec}
        for new, old in ((a, b) for a, b in rec):
            live[new] = live[new] + live.pop(old)
            sizes[new] += sizes.pop(old)
        cw2 = {}
        for (a, b), w in cw.items():
            a2, b2 = sorted((mm.get(a, a), mm.get(b, b)))
            cw2[(a2, b2)] = cw2.get((a2, b2), 0.0) + w
        cw = cw2
        comm = {v: mm.get(c, c) for v, c in comm.items()}
        q = q_of()
        if q > best_q + 1e-12:
            best_q, best = q, dict(comm)

    parts = {}
    for i, c in best.items():
        parts.setdefault(c, set()).add(verts[i])
    return {frozenset(s) for s in parts.values()}


def partition_of(df):
    parts = {}
    for r in df.collect():
        parts.setdefault(r.community, set()).add(r.id)
    return {frozenset(s) for s in parts.values()}


def test_two_cliques_recovered(spark):
    got = partition_of(
        walktrap_communities(edges_df(spark, two_cliques_bridge()))
    )
    assert got == {frozenset(range(5)), frozenset(range(5, 10))}


def test_karate_matches_numpy_twin_and_quality(spark):
    pairs = karate_edges()
    e = edges_df(spark, pairs)
    res = walktrap_communities(e)
    assert partition_of(res) == py_walktrap(pairs)
    # igraph's sequential walktrap cuts karate at Q~0.3532; the
    # round-granularity cut must stay in that neighborhood
    assert modularity(e, res) > 0.33


def test_ring_matches_numpy_twin(spark):
    pairs = ring_edges(12)
    assert partition_of(
        walktrap_communities(edges_df(spark, pairs))
    ) == py_walktrap(pairs)


def test_deterministic_across_partitioning(spark):
    pairs = two_cliques_bridge()
    a = walktrap_communities(edges_df(spark, pairs)).collect()
    b = walktrap_communities(
        edges_df(spark, pairs).repartition(7).cache()
    ).collect()
    assert sorted((r.id, r.community) for r in a) == sorted(
        (r.id, r.community) for r in b
    )
