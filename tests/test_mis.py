"""Parity tests for Luby MIS and Jones–Plassmann coloring (mis.py).

With fixed hash priorities both algorithms equal their sequential
greedy counterparts (ascending priority for MIS, descending for
coloring) — so the oracle is EXACT equality against a 10-line Python
replay, plus structural validity (independence/maximality, proper
coloring) on random graphs. DuckDB twins are exercised by the driver
contract."""

from __future__ import annotations

import random

import pytest

from graftlink.mis import A, C, P, greedy_coloring, maximal_independent_set

from tests.conftest import edges_df


def _pri(v):
    return ((v % P) * A + C) % P


def _nbrs(pairs):
    nbrs = {}
    for a, b in pairs:
        if a != b:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    return nbrs


def _greedy_mis(nbrs):
    in_mis = set()
    for v in sorted(nbrs, key=_pri):
        if not (nbrs[v] & in_mis):
            in_mis.add(v)
    return in_mis


def _greedy_coloring(nbrs):
    # largest-degree-first, hash tie-break (the engine's JP priority)
    colors = {}
    for v in sorted(nbrs, key=lambda v: (-len(nbrs[v]), -_pri(v))):
        used = {colors[u] for u in nbrs[v] if u in colors}
        k = 0
        while k in used:
            k += 1
        colors[v] = k
    return colors


def _er(n, m, seed):
    rnd = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            pairs.add((a, b))
    return sorted(pairs)


@pytest.mark.parametrize("seed,n,m", [(1, 30, 80), (2, 60, 260), (3, 40, 40)])
def test_mis_matches_sequential_greedy(spark, seed, n, m):
    pairs = _er(n, m, seed)
    nbrs = _nbrs(pairs)
    want = _greedy_mis(nbrs)
    got = {
        r.id: r.in_mis
        for r in maximal_independent_set(edges_df(spark, pairs)).collect()
    }
    assert got == {v: v in want for v in nbrs}


def test_mis_is_independent_and_maximal(spark):
    pairs = _er(80, 400, seed=9)
    nbrs = _nbrs(pairs)
    got = {
        r.id: r.in_mis
        for r in maximal_independent_set(edges_df(spark, pairs)).collect()
    }
    mis = {v for v, f in got.items() if f}
    for a, b in pairs:  # independence
        assert not (a in mis and b in mis), (a, b)
    for v, f in got.items():  # maximality
        if not f:
            assert nbrs[v] & mis, v


@pytest.mark.parametrize("seed,n,m", [(4, 30, 90), (5, 50, 300)])
def test_coloring_matches_sequential_greedy(spark, seed, n, m):
    pairs = _er(n, m, seed)
    want = _greedy_coloring(_nbrs(pairs))
    got = {
        r.id: r.color
        for r in greedy_coloring(edges_df(spark, pairs)).collect()
    }
    assert got == want


def test_coloring_is_proper(spark):
    pairs = _er(70, 500, seed=6)
    got = {
        r.id: r.color for r in greedy_coloring(edges_df(spark, pairs)).collect()
    }
    for a, b in pairs:
        assert got[a] != got[b], (a, b)


def test_coloring_star_uses_two_colors(spark):
    pairs = [(0, d) for d in range(1, 12)]
    got = {r.id: r.color
           for r in greedy_coloring(edges_df(spark, pairs)).collect()}
    assert len(set(got.values())) == 2
    leaves = {got[d] for d in range(1, 12)}
    assert len(leaves) == 1 and got[0] not in leaves


def test_mis_resume_exact(spark, tmp_path):
    from graftlink.checkpoint import fingerprint_edges

    pairs = _er(50, 200, seed=11)
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    full = {r.id: r.in_mis
            for r in maximal_independent_set(e).collect()}
    d = str(tmp_path / "mis")
    import pytest as _pt
    with _pt.raises(RuntimeError, match="did not converge"):
        maximal_independent_set(e, max_rounds=1, checkpoint_dir=d,
                                fingerprint=fp)
    resumed = {
        r.id: r.in_mis
        for r in maximal_independent_set(
            e, checkpoint_dir=d, resume=True, fingerprint=fp
        ).collect()
    }
    assert resumed == full


def test_coloring_resume_exact(spark, tmp_path):
    from graftlink.checkpoint import fingerprint_edges

    pairs = _er(40, 220, seed=12)
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    full = {r.id: r.color for r in greedy_coloring(e).collect()}
    d = str(tmp_path / "col")
    import pytest as _pt
    with _pt.raises(RuntimeError, match="did not converge"):
        greedy_coloring(e, max_rounds=1, checkpoint_dir=d, fingerprint=fp)
    resumed = {
        r.id: r.color
        for r in greedy_coloring(
            e, checkpoint_dir=d, resume=True, fingerprint=fp
        ).collect()
    }
    assert resumed == full
