"""Parity tests for the structural-similarity / link-prediction family
(graftlink/linkpred.py) vs brute-force Python oracles on the shared
fixtures. Every operator is also oracle-checked cross-engine through
the driver contract (__spark_entry__.oracle_sql)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from graftlink.linkpred import (
    avg_neighbor_degree,
    bibcoupling,
    cocitation,
    dice_similarity,
    inverse_log_weighted_similarity,
    knnk,
)
from tests.conftest import edges_df
from tests.oracles import er_edges, karate_edges


def _und_adj(pairs):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


DIRECTED = er_edges(40, 0.12, seed=7)


def test_cocitation_brute(spark):
    e = edges_df(spark, DIRECTED)
    got = {(r.a, r.b): r.cocitation for r in cocitation(e).collect()}
    ins = defaultdict(set)
    for s, d in set(DIRECTED):
        if s != d:
            ins[d].add(s)
    verts = sorted(ins)
    want = {}
    for i, a in enumerate(verts):
        for b in verts[i + 1 :]:
            c = len(ins[a] & ins[b])
            if c:
                want[(a, b)] = c
    assert got == want


def test_bibcoupling_brute(spark):
    e = edges_df(spark, DIRECTED)
    got = {(r.a, r.b): r.bibcoupling for r in bibcoupling(e).collect()}
    outs = defaultdict(set)
    for s, d in set(DIRECTED):
        if s != d:
            outs[s].add(d)
    verts = sorted(outs)
    want = {}
    for i, a in enumerate(verts):
        for b in verts[i + 1 :]:
            c = len(outs[a] & outs[b])
            if c:
                want[(a, b)] = c
    assert got == want


def test_dice_karate(spark):
    pairs = karate_edges()
    e = edges_df(spark, pairs)
    got = {(r.a, r.b): r.similarity for r in dice_similarity(e).collect()}
    adj = _und_adj(pairs)
    for (a, b), sim in got.items():
        common = len(adj[a] & adj[b])
        assert common >= 1
        want = 2.0 * common / (len(adj[a]) + len(adj[b]))
        assert sim == pytest.approx(want, abs=1e-8)
    # completeness: every overlapping pair is present
    verts = sorted(adj)
    n_pairs = sum(
        1
        for i, a in enumerate(verts)
        for b in verts[i + 1 :]
        if adj[a] & adj[b]
    )
    assert len(got) == n_pairs


def test_adamic_adar_karate(spark):
    pairs = karate_edges()
    e = edges_df(spark, pairs)
    got = {
        (r.a, r.b): r.similarity
        for r in inverse_log_weighted_similarity(e).collect()
    }
    adj = _und_adj(pairs)
    for (a, b), sim in got.items():
        want = sum(1.0 / math.log(len(adj[c])) for c in adj[a] & adj[b])
        assert sim == pytest.approx(want, abs=1e-6)


def test_max_center_degree_cap(spark):
    # capping removes hub-centered wedges: with cap < max degree the
    # pair counts can only shrink, and equal the brute force over
    # non-hub centers
    pairs = karate_edges()
    e = edges_df(spark, pairs)
    adj = _und_adj(pairs)
    cap = 5
    got = {
        (r.a, r.b): r.similarity
        for r in dice_similarity(e, max_center_degree=cap).collect()
    }
    full = {
        (r.a, r.b): r.similarity for r in dice_similarity(e).collect()
    }
    assert set(got) <= set(full)
    # a pair whose only common neighbors are hubs disappears
    hubs = {v for v in adj if len(adj[v]) > cap}
    dropped = [
        (a, b)
        for (a, b) in full
        if (adj[a] & adj[b]) and (adj[a] & adj[b]) <= hubs
    ]
    assert all(p not in got for p in dropped)


def test_knn_and_knnk(spark):
    pairs = karate_edges()
    e = edges_df(spark, pairs)
    adj = _und_adj(pairs)
    got = {r.id: (r.deg, r.knn) for r in avg_neighbor_degree(e).collect()}
    assert set(got) == set(adj)
    for v, (deg, knn) in got.items():
        assert deg == len(adj[v])
        want = sum(len(adj[u]) for u in adj[v]) / len(adj[v])
        assert knn == pytest.approx(want, abs=1e-8)
    kk = {r.deg: r.knnk for r in knnk(e).collect()}
    by_deg = defaultdict(list)
    for v, (deg, knn) in got.items():
        by_deg[deg].append(knn)
    for deg, vals in by_deg.items():
        assert kk[deg] == pytest.approx(sum(vals) / len(vals), abs=1e-6)
