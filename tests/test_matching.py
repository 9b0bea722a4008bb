"""maximal_matching parity: sequential greedy-by-priority twin
(exact equality — the documented determinism contract), matching
validity + maximality, the |M| >= |M*|/2 guarantee vs networkx, and
DuckDB twin parity (the driver's hash path)."""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest

from graftlink.matching import P, maximal_matching, maximal_matching_sql
from tests.conftest import edges_df


def _pri_py(x: int) -> int:
    A = 2_654_435_761 % P
    return ((x % P) * A + 824_633_702) % P


def _greedy_py(pairs) -> set[tuple[int, int]]:
    """Sequential greedy matching scanning edges ascending by
    (eh, a, b) — the spec maximal_matching must equal exactly."""
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    order = sorted(und, key=lambda e: ((_pri_py(e[0]) * 31 + _pri_py(e[1])) % P, e))
    used: set[int] = set()
    m = set()
    for a, b in order:
        if a not in used and b not in used:
            m.add((a, b))
            used.update((a, b))
    return m


FIXTURES = {
    "path5": [(0, 1), (1, 2), (2, 3), (3, 4)],
    "star": [(0, i) for i in range(1, 8)],
    "two_triangles": [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
    "karate": list(nx.karate_club_graph().edges()),
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_equals_sequential_greedy(spark, name):
    pairs = FIXTURES[name]
    got = {
        (r["a"], r["b"])
        for r in maximal_matching(
            edges_df(spark, pairs), checkpoint_mode="local"
        ).collect()
    }
    assert got == _greedy_py(pairs), name


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_valid_maximal_and_half_approx(spark, name):
    pairs = FIXTURES[name]
    m = {
        (r["a"], r["b"])
        for r in maximal_matching(
            edges_df(spark, pairs), checkpoint_mode="local"
        ).collect()
    }
    used = [v for e in m for v in e]
    assert len(used) == len(set(used)), "shares a vertex"
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    assert m <= und
    mv = set(used)
    for a, b in und:  # maximality: every edge touches a matched vertex
        assert a in mv or b in mv
    opt = nx.max_weight_matching(nx.Graph(und), maxcardinality=True)
    assert len(m) * 2 >= len(opt)


def test_twin_parity(spark):
    pairs = FIXTURES["karate"]
    got = sorted(
        (r["a"], r["b"])
        for r in maximal_matching(
            edges_df(spark, pairs), checkpoint_mode="local"
        ).collect()
    )
    vals = " UNION ALL ".join(f"SELECT {a} AS src, {b} AS dst" for a, b in pairs)
    twin = sorted(
        map(tuple, duckdb.sql(maximal_matching_sql(vals)).fetchall())
    )
    assert got == twin


def test_checkpoint_resume(spark, tmp_path):
    pairs = FIXTURES["karate"]
    full = maximal_matching(
        edges_df(spark, pairs), checkpoint_dir=str(tmp_path / "a")
    ).collect()
    # simulate a kill after round 1: run with max_rounds=1 budget by
    # checkpointing, then resume from the saved state
    d = str(tmp_path / "b")
    try:
        maximal_matching(edges_df(spark, pairs), max_rounds=1, checkpoint_dir=d)
    except RuntimeError:
        pass
    resumed = maximal_matching(
        edges_df(spark, pairs), checkpoint_dir=d, resume=True
    ).collect()
    assert sorted(map(tuple, resumed)) == sorted(map(tuple, full))
