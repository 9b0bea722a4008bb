"""Deterministic degree-preserving rewire: invariants (exact in/out
degree sequences, simple-graph, edge count), determinism, actual
mixing, and the unrolled DuckDB replay twin."""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import pytest

from graftlink.rewire import rewire_edges, rewire_sql
from tests.conftest import edges_df


def _er_directed(n, m, seed):
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((a, b))
    return sorted(pairs)


def _run(spark, pairs, rounds=3, seed=42):
    out = rewire_edges(edges_df(spark, pairs), rounds=rounds, seed=seed)
    return sorted((r.src, r.dst) for r in out.collect())


@pytest.mark.parametrize("seed", [5, 19])
def test_invariants(spark, seed):
    pairs = _er_directed(50, 180, seed)
    rows = _run(spark, pairs)
    assert len(rows) == len(set(rows)) == len(pairs)
    assert all(a != b for a, b in rows)
    assert Counter(a for a, _ in rows) == Counter(a for a, _ in pairs)
    assert Counter(b for _, b in rows) == Counter(b for _, b in pairs)
    assert set(rows) != set(pairs)  # something actually rewired


def test_determinism_and_seed_sensitivity(spark):
    pairs = _er_directed(40, 140, 7)
    assert _run(spark, pairs) == _run(spark, pairs)
    assert _run(spark, pairs, seed=42) != _run(spark, pairs, seed=43)


def test_duckdb_twin(spark):
    pairs = _er_directed(40, 150, 11)
    rows = _run(spark, pairs, rounds=2, seed=42)
    vals = ",".join(f"({a},{b})" for a, b in pairs)
    clean = f"SELECT src, dst FROM (VALUES {vals}) t(src, dst)"
    orows = sorted(duckdb.sql(rewire_sql(clean, rounds=2, seed=42)).fetchall())
    assert orows == rows
