"""Dominator tree: networkx immediate_dominators parity + twin
equivalence + determinism + kill-resume."""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest
from pyspark.sql import functions as F

from graftlink.dominators import dominator_tree, dominator_tree_sql
from tests.conftest import edges_df
from tests.oracles import er_edges


def _nx_idoms(edge_list, root):
    g = nx.DiGraph()
    g.add_node(root)
    g.add_edges_from(edge_list)
    d = nx.immediate_dominators(g, root)
    out = {v: (None if v == root else u) for v, u in d.items()}
    out[root] = None  # some nx versions omit the root row
    return out


def _spark_idoms(spark, edge_list, root):
    out = dominator_tree(edges_df(spark, edge_list), root)
    return {r["id"]: r["idom"] for r in out.collect()}


FIXTURES = [
    # simple diamond: idom(3) = 0
    [(0, 1), (0, 2), (1, 3), (2, 3)],
    # chain + back edge (reducible loop)
    [(0, 1), (1, 2), (2, 3), (3, 1)],
    # irreducible: two entries into a cycle
    [(0, 1), (0, 2), (1, 3), (2, 4), (3, 4), (4, 3)],
    # nested loops
    [(0, 1), (1, 2), (2, 3), (3, 2), (3, 4), (4, 1), (4, 5)],
    # unreachable component must be absent
    [(0, 1), (1, 2), (7, 8)],
]


@pytest.mark.parametrize("edges", FIXTURES)
def test_networkx_parity_fixtures(spark, edges):
    assert _spark_idoms(spark, edges, 0) == _nx_idoms(edges, 0)


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_networkx_parity_er(spark, seed):
    edges = er_edges(40, 0.08, seed)
    assert _spark_idoms(spark, edges, 0) == _nx_idoms(edges, 0)


def test_twin_matches(spark):
    edges = er_edges(35, 0.1, 9)
    got = _spark_idoms(spark, edges, 0)
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    want = {
        r[0]: r[1]
        for r in con.execute(
            dominator_tree_sql(
                f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", 0
            )
        ).fetchall()
    }
    assert got == want


def test_deterministic_across_partitioning(spark):
    edges = er_edges(40, 0.08, 5)
    e = edges_df(spark, edges)
    a = sorted(map(tuple, dominator_tree(e.repartition(1), 0).collect()))
    b = sorted(map(tuple, dominator_tree(e.repartition(13), 0).collect()))
    assert a == b


def test_kill_resume(spark, tmp_path):
    edges = er_edges(40, 0.08, 7)
    e = edges_df(spark, edges)
    want = {r["id"]: r["idom"] for r in dominator_tree(e, 0).collect()}
    ck = str(tmp_path / "dom")
    # run once to completion with durable checkpoints, then resume:
    # the resumed run must load the fixpoint and converge immediately
    dominator_tree(e, 0, checkpoint_dir=ck).collect()
    got = {
        r["id"]: r["idom"]
        for r in dominator_tree(e, 0, checkpoint_dir=ck, resume=True).collect()
    }
    assert got == want
