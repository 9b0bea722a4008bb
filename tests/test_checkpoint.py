"""Checkpoint/resume (BASELINE.md row 9): state after
kill-at-iteration-k + resume == uninterrupted run; lineage sane."""

import json
import os

import numpy as np

from graftlink.checkpoint import CheckpointManager, fingerprint_edges
from graftlink.components import connected_components
from graftlink.pagerank import pagerank

from tests.conftest import edges_df
from tests.oracles import er_edges, karate_edges


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_pagerank_resume_bit_exact(spark, tmp_path):
    pairs = karate_edges()
    both = pairs + [(b, a) for a, b in pairs]
    e = edges_df(spark, both)
    verts = spark.range(34)
    fp = fingerprint_edges(e)

    full = _ranks(
        pagerank(e, vertices=verts, checkpoint_dir=str(tmp_path / "full"), fingerprint=fp)
    )

    # "killed" run: only 3 iterations persisted
    part_dir = str(tmp_path / "killed")
    pagerank(e, vertices=verts, max_iter=3, checkpoint_dir=part_dir, fingerprint=fp)
    # resume from the kill point
    resumed = _ranks(
        pagerank(
            e, vertices=verts, checkpoint_dir=part_dir, resume=True, fingerprint=fp
        )
    )
    assert set(full) == set(resumed)
    # float sums' combine order isn't fixed across runs, so "identical
    # up to shuffle-order fp noise" is the honest contract for rank
    # state; label state (test_cc_minlabel_resume) is exactly equal.
    got = np.array([resumed[k] for k in sorted(full)])
    want = np.array([full[k] for k in sorted(full)])
    assert np.allclose(got, want, atol=1e-12)


def test_lineage_contents(spark, tmp_path):
    pairs = er_edges(30, 0.05, 8)
    e = edges_df(spark, pairs)
    d = str(tmp_path / "chk")
    stats = {}
    pagerank(
        e, vertices=spark.range(30), max_iter=4, checkpoint_dir=d,
        fingerprint=fingerprint_edges(e), stats=stats,
    )
    its = sorted(
        int(n.split("=")[1]) for n in os.listdir(os.path.join(d, "pagerank"))
    )
    assert its == list(range(len(its)))
    lineage_path = os.path.join(d, "pagerank", f"it={its[-1]}", "_lineage.json")
    with open(lineage_path) as f:
        lin = json.load(f)
    assert lin["algo"] == "pagerank"
    assert lin["rows"] == 30
    assert sum(c for _, c in lin["partition_rows"]) == 30
    assert lin["counters"]["edges_processed"] == stats["m"]
    assert lin["input_fingerprint"].startswith("m=")


def test_stale_fingerprint_not_resumed(spark, tmp_path):
    e1 = edges_df(spark, er_edges(20, 0.08, 1))
    e2 = edges_df(spark, er_edges(20, 0.08, 2))
    d = str(tmp_path / "chk2")
    fp1, fp2 = fingerprint_edges(e1), fingerprint_edges(e2)
    assert fp1 != fp2
    pagerank(e1, vertices=spark.range(20), max_iter=2, checkpoint_dir=d, fingerprint=fp1)
    mgr = CheckpointManager(d, "pagerank", spark, input_fingerprint=fp2)
    assert mgr.latest() is None  # checkpoint of other input is invisible


def test_cc_minlabel_resume(spark, tmp_path):
    pairs = er_edges(40, 0.03, 12)
    e = edges_df(spark, pairs)
    verts = spark.range(40)
    fp = fingerprint_edges(e)
    full = {
        r["id"]: r["component"]
        for r in connected_components(
            e, vertices=verts, algo="minlabel",
            checkpoint_dir=str(tmp_path / "ccf"), fingerprint=fp,
        ).collect()
    }
    d = str(tmp_path / "cck")
    connected_components(
        e, vertices=verts, algo="minlabel", max_iter=2,
        checkpoint_dir=d, fingerprint=fp,
    )
    resumed = {
        r["id"]: r["component"]
        for r in connected_components(
            e, vertices=verts, algo="minlabel",
            checkpoint_dir=d, resume=True, fingerprint=fp,
        ).collect()
    }
    assert full == resumed


# ---------------------------------------------------------------------------
# round-3: durable resume for the round-2 loops (VERDICT next #6)
# ---------------------------------------------------------------------------


def test_multi_source_bfs_resume_exact(spark, tmp_path):
    from graftlink.paths import multi_source_bfs

    pairs = er_edges(60, 0.05, 21)
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    srcs = [0, 3, 7]

    def dists(df):
        return {(r.source, r.id): r.dist for r in df.collect()}

    full = dists(multi_source_bfs(e, srcs, checkpoint_dir=str(tmp_path / "f"),
                                  fingerprint=fp))
    d = str(tmp_path / "k")
    multi_source_bfs(e, srcs, max_depth=2, checkpoint_dir=d, fingerprint=fp)
    resumed = dists(multi_source_bfs(e, srcs, checkpoint_dir=d, resume=True,
                                     fingerprint=fp))
    assert full == resumed  # int label state: exactly equal


def test_sssp_resume_exact(spark, tmp_path):
    from pyspark.sql import functions as F

    from graftlink.paths import sssp_weighted

    pairs = er_edges(60, 0.05, 22)
    e = edges_df(spark, pairs).withColumn(
        "weight", (F.col("src") % 5 + F.col("dst") % 3 + 1).cast("double")
    )
    fp = fingerprint_edges(e)

    def dists(df):
        return {r.id: r.dist for r in df.collect()}

    full = dists(sssp_weighted(e, 0, checkpoint_dir=str(tmp_path / "f"),
                               fingerprint=fp))
    d = str(tmp_path / "k")
    sssp_weighted(e, 0, max_iter=2, checkpoint_dir=d, fingerprint=fp)
    resumed = dists(sssp_weighted(e, 0, checkpoint_dir=d, resume=True,
                                  fingerprint=fp))
    assert set(full) == set(resumed)
    for k in full:
        assert abs(full[k] - resumed[k]) < 1e-12


def test_scc_resume_exact(spark, tmp_path):
    """Kill SCC after outer round 0 (max_outer=1 raises the residual
    error by design — truncation must surface), resume from the
    durable triple, result == uninterrupted run."""
    import pytest

    from graftlink.scc import strongly_connected_components

    # two 4-cycles with the MAX-id cycle upstream: the downstream
    # cycle inherits the upstream color (forward max propagation), so
    # both land in ONE color class and only SCC(root) retires in
    # outer round 0 — the downstream cycle needs round 1
    pairs = [(100, 101), (101, 102), (102, 103), (103, 100),
             (10, 11), (11, 12), (12, 13), (13, 10),
             (103, 10)]
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)

    def comps(df):
        return {r.id: r.component for r in df.collect()}

    full = comps(strongly_connected_components(e))
    d = str(tmp_path / "k")
    with pytest.raises(RuntimeError, match="max_outer"):
        strongly_connected_components(
            e, max_outer=1, checkpoint_dir=d, fingerprint=fp
        )
    resumed = comps(strongly_connected_components(
        e, checkpoint_dir=d, resume=True, fingerprint=fp
    ))
    assert full == resumed


# ---------------------------------------------------------------------------
# round-4: durable resume for betweenness + the community levels
# (round-3 VERDICT next #7)
# ---------------------------------------------------------------------------


def _kill_then_resume(spark, monkeypatch, run, prefix, n_saves):
    """full run -> killed run (`n_saves` durable saves of managers
    whose algo starts with `prefix` land, then death — a faithful kill
    simulation: the state IS on disk, the process is gone) -> resumed
    run; returns (full, resumed) for exact comparison."""
    import pytest

    full = run(checkpoint_dir=None, resume=False)
    orig = CheckpointManager.save
    state = {"left": n_saves}

    def killing_save(mgr, df, iteration, key, counters, stats_cols=None):
        out = orig(mgr, df, iteration, key, counters, stats_cols)
        if mgr.algo.startswith(prefix) and mgr.mode != "local":
            state["left"] -= 1
            if state["left"] == 0:
                raise RuntimeError("simulated kill")
        return out

    monkeypatch.setattr(CheckpointManager, "save", killing_save)
    with pytest.raises(RuntimeError, match="simulated kill"):
        run(checkpoint_dir="KILL", resume=False)
    monkeypatch.setattr(CheckpointManager, "save", orig)
    resumed = run(checkpoint_dir="KILL", resume=True)
    assert state["left"] == 0, "kill never fired: the killed run saved too few times"
    return full, resumed


def test_betweenness_resume_mid_forward(spark, monkeypatch, tmp_path):
    from graftlink.paths import betweenness_from_sources

    pairs = er_edges(60, 0.05, 23)
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    d = str(tmp_path / "btw-fwd-kill")

    def run(checkpoint_dir, resume):
        df = betweenness_from_sources(
            e, [0, 3, 7], directed=False,
            checkpoint_dir=d if checkpoint_dir else None,
            resume=resume, fingerprint=fp,
        )
        return {r.id: r.betweenness for r in df.collect()}

    full, resumed = _kill_then_resume(spark, monkeypatch, run, "btw-fwd", 2)
    assert full == resumed  # rounded to 6dp in-engine: exact equality


def test_betweenness_resume_mid_backward(spark, monkeypatch, tmp_path):
    from graftlink.paths import betweenness_from_sources

    pairs = er_edges(60, 0.05, 24)
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    d = str(tmp_path / "btw-bwd-kill")

    def run(checkpoint_dir, resume):
        df = betweenness_from_sources(
            e, [0, 3, 7], directed=False,
            checkpoint_dir=d if checkpoint_dir else None,
            resume=resume, fingerprint=fp,
        )
        return {r.id: r.betweenness for r in df.collect()}

    full, resumed = _kill_then_resume(spark, monkeypatch, run, "btw-bwd", 2)
    assert full == resumed


def test_betweenness_truncated_forward_raises(spark, tmp_path):
    """A depth-truncated forward pass must surface, not silently
    under-count (and in durable mode, not land backward frames a
    resume would trust)."""
    import pytest

    from graftlink.paths import betweenness_from_sources

    pairs = [(i, i + 1) for i in range(10)]  # path: ecc 10 from 0
    e = edges_df(spark, pairs)
    with pytest.raises(RuntimeError, match="max_depth"):
        betweenness_from_sources(e, [0], max_depth=3)


def test_louvain_resume_after_level(spark, monkeypatch, tmp_path):
    from graftlink.louvain import louvain_communities
    from tests.oracles import ring_of_cliques

    pairs = ring_of_cliques(6, 5)
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    d = str(tmp_path / "louvain-kill")

    def run(checkpoint_dir, resume):
        df = louvain_communities(
            e, checkpoint_dir=d if checkpoint_dir else None,
            resume=resume, fingerprint=fp,
        )
        return {r.id: r.community for r in df.collect()}

    # 2 durable saves per completed level (mapping + wedges); kill
    # right after level 0 lands
    full, resumed = _kill_then_resume(spark, monkeypatch, run, "louvain-", 2)
    assert full == resumed


def test_leiden_resume_after_level(spark, monkeypatch, tmp_path):
    from graftlink.louvain import leiden_communities
    from tests.oracles import ring_of_cliques

    pairs = ring_of_cliques(6, 5)
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    d = str(tmp_path / "leiden-kill")

    def run(checkpoint_dir, resume):
        df = leiden_communities(
            e, checkpoint_dir=d if checkpoint_dir else None,
            resume=resume, fingerprint=fp,
        )
        return {r.id: r.community for r in df.collect()}

    # 4 durable saves per completed level; kill right after level 0
    full, resumed = _kill_then_resume(spark, monkeypatch, run, "leiden-", 4)
    assert full == resumed


def test_infomap_resume_after_level(spark, monkeypatch, tmp_path):
    from graftlink.infomap import infomap_communities
    from tests.oracles import ring_of_cliques

    pairs = ring_of_cliques(6, 5)
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    d = str(tmp_path / "infomap-kill")

    def run(checkpoint_dir, resume):
        df = infomap_communities(
            e, checkpoint_dir=d if checkpoint_dir else None,
            resume=resume, fingerprint=fp,
        )
        return {r.id: r.community for r in df.collect()}

    full, resumed = _kill_then_resume(spark, monkeypatch, run, "infomap-", 2)
    assert full == resumed


def test_fastgreedy_resume_after_round(spark, monkeypatch, tmp_path):
    from graftlink.fastgreedy import fastgreedy_communities
    from tests.oracles import ring_of_cliques

    pairs = ring_of_cliques(6, 5)
    e = edges_df(spark, pairs)
    fp = fingerprint_edges(e)
    d = str(tmp_path / "fastgreedy-kill")

    def run(checkpoint_dir, resume):
        df = fastgreedy_communities(
            e, checkpoint_dir=d if checkpoint_dir else None,
            resume=resume, fingerprint=fp,
        )
        return {r.id: r.community for r in df.collect()}

    # 2 durable saves per completed round (cg + comm); kill after the
    # first save of round 1 -> resume restarts from round 0's state
    full, resumed = _kill_then_resume(spark, monkeypatch, run, "fastgreedy-", 3)
    assert full == resumed


def test_leading_eigenvector_resume_after_level(spark, monkeypatch, tmp_path):
    """local_threshold=0 forces the distributed level loop: the hybrid
    default would finish this fixture inside the level-0 local kernel
    and return before any durable save lands (level granularity —
    nothing to resume)."""
    from graftlink.leading_eigenvector import leading_eigenvector_communities
    from tests.oracles import two_cliques_bridge

    e = edges_df(spark, two_cliques_bridge())
    fp = fingerprint_edges(e)
    d = str(tmp_path / "leigen-kill")

    def run(checkpoint_dir, resume):
        df = leading_eigenvector_communities(
            e, iters=20, local_threshold=0,
            checkpoint_dir=d if checkpoint_dir else None,
            resume=resume, fingerprint=fp,
        )
        return {r.id: r.community for r in df.collect()}

    # 2 durable saves per completed level (asg + finals); kill right
    # after level 0 lands
    full, resumed = _kill_then_resume(spark, monkeypatch, run, "leigen-", 2)
    assert full == resumed
