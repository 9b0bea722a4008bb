"""HyperBall (HLL neighborhood function / effective diameter /
harmonic centrality): cross-engine register parity with the DuckDB
twins, jvm == arrow merge engines, sketch-vs-exact sanity, fixpoint
convergence, durable resume."""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest

from graftlink import hyperball as hb
from graftlink.checkpoint import fingerprint_edges

from tests.conftest import edges_df
from tests.oracles import er_edges, karate_edges, ring_edges


def duck_con(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE base_edges(src BIGINT, dst BIGINT)")
    con.executemany(
        "INSERT INTO base_edges VALUES (?, ?)", [list(p) for p in pairs]
    )
    return con


CLEAN = "SELECT DISTINCT src, dst FROM base_edges WHERE src <> dst"

CASES = {
    "karate": karate_edges(),
    "er60": er_edges(60, 0.06, 3),
    "ring12": ring_edges(12),
    "two_comp": [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12)],
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("mode", ["out", "in", "all"])
def test_balls_twin_bit_equal(spark, name, mode):
    pairs = CASES[name]
    got = sorted(
        (r["id"], float(r["ball_est"]))
        for r in hb.hyperball(
            edges_df(spark, pairs), order=3, log2m=4, mode=mode
        ).collect()
    )
    con = duck_con(pairs)
    want = sorted(
        (r[0], float(r[1]))
        for r in con.execute(
            hb.hyperball_balls_sql(CLEAN, order=3, log2m=4, mode=mode)
        ).fetchall()
    )
    # round(x, 6) on both sides of identical doubles: exact equality
    assert got == want


def test_nf_and_effective_diameter_twins(spark):
    pairs = CASES["er60"]
    e = edges_df(spark, pairs)
    con = duck_con(pairs)
    nf = sorted(
        (r["t"], float(r["nf"]))
        for r in hb.neighborhood_function(e, order=5, log2m=4).collect()
    )
    onf = sorted(
        (r[0], float(r[1]))
        for r in con.execute(
            hb.neighborhood_function_sql(CLEAN, order=5, log2m=4)
        ).fetchall()
    )
    assert nf == onf
    # NF is monotone non-decreasing in t (register max is monotone)
    vals = [v for _, v in nf]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    ed = hb.effective_diameter(e, q=0.9, order=6, log2m=4).collect()[0][0]
    oed = con.execute(
        hb.effective_diameter_sql(CLEAN, q=0.9, order=6, log2m=4)
    ).fetchall()[0][0]
    assert float(ed) == float(oed)


def test_harmonic_twin_and_exact_correlation(spark):
    pairs = CASES["karate"]
    e = edges_df(spark, pairs)
    got = {
        r["id"]: float(r["harmonic_est"])
        for r in hb.hyperball(
            e, order=5, log2m=6, mode="in", harmonic=True
        ).select("id", "harmonic_est").collect()
    }
    con = duck_con(pairs)
    want = dict(
        con.execute(hb.hyperball_harmonic_sql(CLEAN, order=5, log2m=6)).fetchall()
    )
    assert got == {k: float(v) for k, v in want.items()}
    # sketch estimates rank-correlate with exact harmonic centrality
    g = nx.DiGraph()
    g.add_edges_from(pairs)
    exact = nx.harmonic_centrality(g)
    ids = sorted(got)
    top_exact = set(sorted(ids, key=lambda i: -exact[i])[:5])
    top_est = set(sorted(ids, key=lambda i: -got[i])[:8])
    assert len(top_exact & top_est) >= 3


def test_closeness_twin_and_exact_correlation(spark):
    # includes an isolated-side fixture: vertices 10..12 in two_comp
    # reach nothing in mode="out" from 12 -> closeness NULL there
    for name in ("karate", "two_comp"):
        pairs = CASES[name]
        e = edges_df(spark, pairs)
        got = {
            r["id"]: (
                None
                if r["closeness_est"] is None
                else round(float(r["closeness_est"]), 6)
            )
            for r in hb.hyperball(
                e, order=5, log2m=6, mode="out", closeness=True
            ).select("id", "closeness_est").collect()
        }
        con = duck_con(pairs)
        want = {
            i: (None if c is None else round(float(c), 6))
            for i, _, c in con.execute(
                hb.hyperball_closeness_sql(CLEAN, order=5, log2m=6, mode="out")
            ).fetchall()
        }
        assert got == want, name
    # rank sanity vs exact closeness on UNDIRECTED karate (connected,
    # diameter 5, so the 5-round ball is the full graph; directed
    # out-closeness is rank-pathological by definition — a leaf that
    # reaches one vertex at distance 1 scores a perfect 1.0)
    g = nx.Graph()
    g.add_edges_from(CASES["karate"])
    exact = nx.closeness_centrality(g)
    pairs = CASES["karate"]
    e = edges_df(spark, pairs)
    got = {
        r["id"]: float(r["closeness_est"])
        for r in hb.hyperball(
            e, order=5, log2m=8, mode="all", closeness=True
        ).collect()
        if r["closeness_est"] is not None
    }
    ids = sorted(got)
    top_exact = set(sorted(ids, key=lambda i: -exact[i])[:5])
    top_est = set(sorted(ids, key=lambda i: -got[i])[:8])
    assert len(top_exact & top_est) >= 3


def test_arrow_engine_identical(spark):
    pairs = CASES["er60"]
    e = edges_df(spark, pairs)
    jvm = sorted(
        tuple(r) for r in hb.hyperball(e, order=3, log2m=5, engine="jvm").collect()
    )
    arrow = sorted(
        tuple(r)
        for r in hb.hyperball(e, order=3, log2m=5, engine="arrow").collect()
    )
    assert jvm == arrow


def test_fixpoint_convergence(spark):
    # order=None stops when the register sum is a fixpoint; final
    # state equals a long fixed-order run exactly (integer registers)
    pairs = CASES["two_comp"]
    e = edges_df(spark, pairs)
    tr: list = []
    stats: dict = {}
    conv = sorted(
        tuple(r)
        for r in hb.hyperball(
            e, log2m=4, max_iter=30, trace=tr, stats=stats
        ).collect()
    )
    fixed = sorted(
        tuple(r) for r in hb.hyperball(e, order=10, log2m=4).collect()
    )
    assert conv == fixed
    assert stats["iterations"] <= 6  # tiny diameter, not 30


def test_ball_estimates_track_exact_reachability(spark):
    # log2m=8 (256 registers): HLL rse ~ 1.04/16 ~ 6.5%; on a
    # 12-ring every out-ball at r=3 is exactly 4 vertices
    e = edges_df(spark, ring_edges(12))
    rows = hb.hyperball(e, order=3, log2m=8, mode="out").collect()
    for r in rows:
        assert abs(float(r["ball_est"]) - 4.0) / 4.0 < 0.25


def test_resume_bit_exact(spark, tmp_path):
    pairs = CASES["er60"]
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    full = sorted(
        tuple(r)
        for r in hb.hyperball(
            e, order=5, log2m=4,
            checkpoint_dir=str(tmp_path / "full"), fingerprint=fp,
        ).collect()
    )
    part = str(tmp_path / "killed")
    hb.hyperball(
        e, order=2, log2m=4, checkpoint_dir=part, fingerprint=fp
    ).collect()
    resumed = sorted(
        tuple(r)
        for r in hb.hyperball(
            e, order=5, log2m=4, checkpoint_dir=part, resume=True,
            fingerprint=fp,
        ).collect()
    )
    assert resumed == full  # integer registers: exact equality


def test_harmonic_requires_in_mode(spark):
    e = edges_df(spark, CASES["ring12"])
    with pytest.raises(ValueError, match="mode='in'"):
        hb.hyperball(e, order=2, harmonic=True, mode="out")
