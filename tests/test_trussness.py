"""Full edge trussness (h-index propagation) vs a sequential-peeling
Python reference, plus cross-operator consistency with k_truss."""

from __future__ import annotations

import random

from graftlink.truss import k_truss, trussness

from tests.conftest import edges_df


def _er(n, m, seed):
    rnd = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            pairs.add((a, b))
    return sorted(pairs)


def _py_trussness(pairs):
    und = {frozenset(p) for p in pairs if p[0] != p[1]}
    t = {}
    k = 2
    cur = set(und)
    while cur:
        k += 1
        while True:
            adj = {}
            for e in cur:
                a, b = tuple(e)
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            removed = {
                e for e in cur
                if len(adj[tuple(e)[0]] & adj[tuple(e)[1]]) < k - 2
            }
            if not removed:
                break
            for e in removed:
                t[e] = k - 1
            cur -= removed
    return t


def test_trussness_matches_peeling(spark):
    for seed, n, m in [(1, 20, 70), (2, 30, 160)]:
        pairs = _er(n, m, seed)
        ref = _py_trussness(pairs)
        got = {
            frozenset((r.a, r.b)): r.trussness
            for r in trussness(edges_df(spark, pairs)).collect()
        }
        assert got == ref, (seed, {k: (got.get(k), ref.get(k))
                                   for k in set(got) ^ set(ref)})


def test_trussness_consistent_with_k_truss(spark):
    pairs = _er(25, 130, seed=4)
    df = edges_df(spark, pairs)
    tr = {frozenset((r.a, r.b)): r.trussness
          for r in trussness(df).collect()}
    for k in (3, 4):
        kt = {frozenset((r.a, r.b)) for r in k_truss(df, k).collect()}
        assert kt == {e for e, t in tr.items() if t >= k}, k


def test_trussness_triangle_free_is_two(spark):
    # star graph: no triangles, every edge trussness 2
    pairs = [(0, d) for d in range(1, 8)]
    got = {r.trussness for r in trussness(edges_df(spark, pairs)).collect()}
    assert got == {2}


def test_trussness_k5(spark):
    # complete K5: every edge in 3 triangles -> 5-truss
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = {r.trussness for r in trussness(edges_df(spark, pairs)).collect()}
    assert got == {5}
