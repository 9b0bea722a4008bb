"""IVF / deterministic k-means (graftlink/ivf.py): numpy spec twin,
planted-cluster recovery, determinism, nprobe=k exactness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graftlink.ivf import ivf_topk, kmeans, kmeans_clusters
from graftlink.sampling import A1, A2, A3, C, DENOM, P


def _bucket(key: int, seed: int = 1) -> int:
    m = key % P
    return ((m * m % P) * A1 + m * A2 + seed * A3 % P + C) % P % DENOM


def _numpy_kmeans(vecs: dict[int, np.ndarray], k: int, iters: int, seed: int = 1):
    """Pure-python twin of the module spec (same fold order — numpy
    sums over dims/ids differ from left folds only in degenerate
    cases, so the parity fixtures use well-separated values; the
    cross-engine BIT parity is the DuckDB twin's job)."""
    ids = sorted(vecs)
    order = sorted(ids, key=lambda i: (_bucket(i, seed), i))
    cents = [vecs[i].astype(float).copy() for i in order[:k]]
    for _ in range(iters):
        assign = {}
        for i in ids:
            d = [float(((vecs[i] - c) ** 2).sum()) for c in cents]
            assign[i] = int(np.argmin(d))  # argmin takes first == min j
        for j in range(k):
            members = [vecs[i] for i in sorted(ids) if assign[i] == j]
            if members:
                cents[j] = np.sum(members, axis=0) / len(members)
    out = {}
    for i in ids:
        d = [float(((vecs[i] - c) ** 2).sum()) for c in cents]
        out[i] = int(np.argmin(d))
    return out


def _emb_df(spark, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in sorted(vecs.items())]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _planted(n_per=20, k=4, d=8, spread=0.05):
    rng = np.random.RandomState(7)
    vecs = {}
    for j in range(k):
        center = np.zeros(d)
        center[j % d] = 10.0 * (j + 1)
        for i in range(n_per):
            vecs[j * n_per + i] = (
                center + spread * rng.randn(d)
            ).astype(np.float32)
    return vecs


def test_kmeans_recovers_planted_clusters(spark):
    vecs = _planted()
    got = {
        r["id"]: r["cluster"]
        for r in kmeans_clusters(_emb_df(spark, vecs), k=4, iters=3).collect()
    }
    # every planted group lands in exactly one cell, each cell distinct
    groups = [{got[j * 20 + i] for i in range(20)} for j in range(4)]
    assert all(len(g) == 1 for g in groups)
    assert len({g.pop() for g in groups}) == 4


def test_kmeans_matches_numpy_spec(spark):
    vecs = _planted(n_per=12, k=3, d=6)
    got = {
        r["id"]: r["cluster"]
        for r in kmeans_clusters(_emb_df(spark, vecs), k=3, iters=2).collect()
    }
    want = _numpy_kmeans(
        {i: np.asarray(v, dtype=np.float64) for i, v in vecs.items()}, 3, 2
    )
    assert got == want


def test_kmeans_deterministic_across_partitioning(spark):
    vecs = _planted(n_per=10, k=3, d=5)
    df = _emb_df(spark, vecs)
    a = sorted(map(tuple, kmeans_clusters(df.repartition(1), k=3, iters=2).collect()))
    b = sorted(map(tuple, kmeans_clusters(df.repartition(7), k=3, iters=2).collect()))
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 over 2 tight planted groups: at least one cell can go empty;
    # the run must still produce a valid total assignment
    vecs = _planted(n_per=8, k=2, d=4, spread=0.01)
    out, cents = kmeans(_emb_df(spark, vecs), k=3, iters=3)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert set(got) == set(vecs)
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)


def test_ivf_full_probe_equals_brute_force(spark):
    from graftlink.similarity import cosine_topk

    vecs = _planted(n_per=15, k=4, d=8, spread=0.5)
    df = _emb_df(spark, vecs)
    qids = [0, 21, 45]
    exact = sorted(map(tuple, cosine_topk(df, qids, k=5).collect()))
    # nprobe = km_k probes every cell -> IVF degenerates to brute force
    full = sorted(
        map(tuple, ivf_topk(df, qids, k=5, nprobe=4, km_k=4, iters=2).collect())
    )
    assert full == exact


def test_ivf_recall_at_nprobe2(spark):
    from graftlink.similarity import cosine_topk

    vecs = _planted(n_per=25, k=4, d=8, spread=1.0)
    df = _emb_df(spark, vecs)
    qids = [3, 30, 57, 80]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, qids, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(df, qids, k=5, nprobe=2, km_k=4, iters=2).collect()
    }
    assert len(got & exact) / len(exact) >= 0.6


def test_kmeans_fast_mode_same_cells_on_separated_data(spark):
    vecs = _planted(n_per=10, k=3, d=6, spread=0.02)
    df = _emb_df(spark, vecs)
    a = sorted(map(tuple, kmeans_clusters(df, k=3, iters=2).collect()))
    b = sorted(map(tuple, kmeans_clusters(df, k=3, iters=2, mode="fast").collect()))
    assert a == b


def test_kmeans_resume_bit_identical(spark, tmp_path):
    vecs = _planted(n_per=12, k=3, d=6, spread=0.5)
    df = _emb_df(spark, vecs)
    fp = "kmfix"
    full, cf = kmeans(
        df, k=3, iters=4, checkpoint_dir=str(tmp_path / "f"), fingerprint=fp
    )
    full_rows = sorted(map(tuple, full.collect()))
    d = str(tmp_path / "k")
    kmeans(df, k=3, iters=2, checkpoint_dir=d, fingerprint=fp)
    res, cr = kmeans(
        df, k=3, iters=4, checkpoint_dir=d, resume=True, fingerprint=fp
    )
    assert cf == cr  # centroid doubles round-trip JSON exactly
    assert sorted(map(tuple, res.collect())) == full_rows


def test_kmeans_stale_fingerprint_not_resumed(spark, tmp_path):
    vecs = _planted(n_per=10, k=2, d=4)
    df = _emb_df(spark, vecs)
    d = str(tmp_path / "k")
    kmeans(df, k=2, iters=2, checkpoint_dir=d, fingerprint="old")
    fresh, _ = kmeans(
        df, k=2, iters=2, checkpoint_dir=d, resume=True, fingerprint="new"
    )
    plain, _ = kmeans(df, k=2, iters=2)
    assert sorted(map(tuple, fresh.collect())) == sorted(
        map(tuple, plain.collect())
    )
