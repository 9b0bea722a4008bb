"""igraph deterministic constructors (gen.py) vs networkx
generators, plus cross-operator sanity (the constructors feed the
engine's own operators)."""

from __future__ import annotations

import networkx as nx

from graftlink.gen import (
    full_graph,
    kary_tree,
    ring_graph,
    square_lattice,
    star_graph,
)


def _und(df):
    return {frozenset((r.src, r.dst)) for r in df.collect()}


def test_ring_matches_cycle_graph(spark):
    got = _und(ring_graph(spark, 9))
    want = {frozenset(e) for e in nx.cycle_graph(9).edges}
    assert got == want
    assert ring_graph(spark, 9, directed=True).count() == 9


def test_star_modes(spark):
    out = {(r.src, r.dst) for r in star_graph(spark, 6, "out").collect()}
    assert out == {(0, d) for d in range(1, 6)}
    inn = {(r.src, r.dst) for r in star_graph(spark, 6, "in").collect()}
    assert inn == {(d, 0) for d in range(1, 6)}
    assert star_graph(spark, 6, "mutual").count() == 10


def test_full_graph(spark):
    got = _und(full_graph(spark, 7))
    want = {frozenset(e) for e in nx.complete_graph(7).edges}
    assert got == want
    assert full_graph(spark, 7, directed=True).count() == 42


def test_kary_tree_matches_networkx(spark):
    # networkx full r-ary tree uses the same (i-1)//k parent layout
    got = {(r.src, r.dst) for r in kary_tree(spark, 15, k=2).collect()}
    want = set(nx.full_rary_tree(2, 15).edges)  # parent < child
    assert got == want


def test_square_lattice_matches_grid(spark):
    rows, cols = 4, 5
    got = _und(square_lattice(spark, rows, cols))
    G = nx.grid_2d_graph(rows, cols)
    want = {
        frozenset((r1 * cols + c1, r2 * cols + c2))
        for (r1, c1), (r2, c2) in G.edges
    }
    assert got == want


def test_constructors_feed_engine_ops(spark):
    # ring of 12 is 2-colorable and its census has no triangles
    from graftlink.mis import greedy_coloring
    from graftlink.triangles import triangle_count

    ring = ring_graph(spark, 12)
    assert triangle_count(ring) == 0
    colors = {r.id: r.color for r in greedy_coloring(ring).collect()}
    assert set(colors.values()) <= {0, 1, 2}
    # tree diameter via pseudo_diameter >= depth bound sanity
    assert kary_tree(spark, 15).count() == 14


def test_watts_strogatz_structure(spark):
    from graftlink.gen import watts_strogatz

    rows = {(r.src, r.dst)
            for r in watts_strogatz(spark, 200, 2, 1, 5, seed=7).collect()}
    # out-degree k for every vertex, no self-loops, deterministic
    assert len(rows) <= 400
    outdeg = {}
    lattice = 0
    for s, d in rows:
        outdeg[s] = outdeg.get(s, 0) + 1
        assert s != d
        if d in ((s + 1) % 200, (s + 2) % 200):
            lattice += 1
    again = {(r.src, r.dst)
             for r in watts_strogatz(spark, 200, 2, 1, 5, seed=7).collect()}
    assert rows == again
    # p = 0.2: most edges stay lattice, a nontrivial fraction rewires
    assert 0.6 * 400 < lattice < 0.95 * 400


def test_watts_strogatz_p_zero_is_ring_lattice(spark):
    from graftlink.gen import watts_strogatz

    rows = sorted((r.src, r.dst)
                  for r in watts_strogatz(spark, 50, 2, 0, 1, seed=3).collect())
    want = sorted((i, (i + j) % 50) for i in range(50) for j in (1, 2))
    assert rows == want


def test_watts_strogatz_duckdb_twin_exact(spark):
    import duckdb

    from graftlink.gen import watts_strogatz, watts_strogatz_sql

    got = sorted((r.src, r.dst)
                 for r in watts_strogatz(spark, 300, 3, 1, 10, seed=42).collect())
    want = sorted(map(tuple,
                      duckdb.sql(watts_strogatz_sql(300, 3, 1, 10, 42)).fetchall()))
    assert got == want
