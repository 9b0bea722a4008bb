"""Fundamental cycles: python BFS-forest twin parity, cycle-space
properties, DuckDB twin, determinism, kill-resume."""

from __future__ import annotations

from collections import deque

import duckdb
import pytest

from graftlink.cyclebasis import fundamental_cycles, fundamental_cycles_sql
from tests.conftest import edges_df
from tests.oracles import er_edges


def _py_fundamental(edge_list):
    """Direct twin: min-id-root / min-predecessor BFS forest, one
    (a, b, lca, len) row per non-tree edge."""
    und = sorted({(min(a, b), max(a, b)) for a, b in edge_list if a != b})
    nbrs: dict = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    dist, parent = {}, {}
    for root in sorted(nbrs):
        if root in dist:
            continue
        dist[root], parent[root] = 0, None
        q = deque([root])
        while q:
            u = q.popleft()
            for v in sorted(nbrs[u]):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
    for v in dist:
        if dist[v] > 0:
            parent[v] = min(
                u for u in nbrs[v] if dist.get(u) == dist[v] - 1
            )
    tree = {
        (min(v, p), max(v, p)) for v, p in parent.items() if p is not None
    }
    out = {}
    for a, b in und:
        if (a, b) in tree:
            continue
        # lockstep identical to the engine: both steps decided from
        # the PRE-round heights
        fa, fb, ha, hb = a, b, dist[a], dist[b]
        while fa != fb:
            sa = ha >= hb
            sb = hb >= ha
            if sa:
                fa, ha = parent[fa], ha - 1
            if sb:
                fb, hb = parent[fb], hb - 1
        out[(a, b)] = (fa, dist[a] + dist[b] + 1 - 2 * ha)
    return out


def _spark_fc(spark, edge_list, **kw):
    df = fundamental_cycles(edges_df(spark, edge_list), **kw)
    return {(r["a"], r["b"]): (r["lca"], r["cycle_len"]) for r in df.collect()}


FIXTURES = [
    [(0, 1), (1, 2), (2, 0)],                       # triangle: len 3
    [(0, 1), (1, 2), (2, 3), (3, 0)],               # square: len 4
    [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 1)],
    [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5)],       # two components
]


@pytest.mark.parametrize("edges", FIXTURES)
def test_python_twin_fixtures(spark, edges):
    assert _spark_fc(spark, edges) == _py_fundamental(edges)


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_python_twin_er(spark, seed):
    edges = er_edges(30, 0.12, seed)
    assert _spark_fc(spark, edges) == _py_fundamental(edges)


def test_cycle_space_dimension(spark):
    """#fundamental cycles == m − n + c (the cycle-space dimension)."""
    edges = er_edges(40, 0.1, 11)
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    verts = {v for e in und for v in e}
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(und)
    c = nx.number_connected_components(g)
    got = _spark_fc(spark, edges)
    assert len(got) == len(und) - len(verts) + c


def test_duckdb_twin(spark):
    edges = er_edges(30, 0.12, 13)
    got = _spark_fc(spark, edges)
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    con = duckdb.connect()
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            fundamental_cycles_sql(
                f"SELECT * FROM (VALUES {vals}) AS t(src, dst)"
            )
        ).fetchall()
    }
    assert got == want


def test_deterministic_across_partitioning(spark):
    edges = er_edges(35, 0.12, 17)
    e = edges_df(spark, edges)
    a = sorted(map(tuple, fundamental_cycles(e.repartition(1)).collect()))
    b = sorted(map(tuple, fundamental_cycles(e.repartition(9)).collect()))
    assert a == b


def test_kill_resume(spark, tmp_path):
    edges = er_edges(35, 0.12, 19)
    e = edges_df(spark, edges)
    want = _spark_fc(spark, edges)
    ck = str(tmp_path / "fc")
    fundamental_cycles(e, checkpoint_dir=ck).collect()
    got = {
        (r["a"], r["b"]): (r["lca"], r["cycle_len"])
        for r in fundamental_cycles(
            e, checkpoint_dir=ck, resume=True
        ).collect()
    }
    assert got == want
