"""HITS + eigenvector centrality vs numpy dense oracles."""

from __future__ import annotations

import numpy as np
import pytest

from graftlink.spectral import eigenvector_centrality, hits
from tests.conftest import edges_df
from tests.oracles import er_edges, karate_edges


def np_hits(n, pairs, iters=500):
    A = np.zeros((n, n))
    for a, b in pairs:
        A[a, b] = 1.0
    h = np.ones(n)
    for _ in range(iters):
        a_vec = A.T @ h
        a_vec /= np.linalg.norm(a_vec) or 1.0
        h = A @ a_vec
        h /= np.linalg.norm(h) or 1.0
    return h / h.max(), a_vec / a_vec.max()


def np_eigen(n, pairs, iters=1000):
    A = np.zeros((n, n))
    for a, b in pairs:
        A[a, b] = 1.0
        A[b, a] = 1.0
    x = np.ones(n)
    for _ in range(iters):
        x = A @ x
        x /= np.linalg.norm(x)
    return x / x.max()


def test_hits_directed_vs_numpy(spark):
    pairs = er_edges(30, 0.12, 9)
    e = edges_df(spark, pairs)
    got = {r.id: (r.hub, r.authority) for r in
           hits(e, vertices=spark.range(30), tol=1e-11, max_iter=60).collect()}
    h, a = np_hits(30, pairs)
    for i in range(30):
        assert got[i][0] == pytest.approx(h[i], abs=1e-3), f"hub {i}"
        assert got[i][1] == pytest.approx(a[i], abs=1e-3), f"auth {i}"


def test_eigenvector_karate_vs_numpy(spark):
    pairs = karate_edges()
    e = edges_df(spark, pairs)
    got = {r.id: r.centrality for r in
           eigenvector_centrality(e, vertices=spark.range(34),
                                  tol=1e-10, max_iter=300).collect()}
    want = np_eigen(34, pairs)
    for i in range(34):
        assert got[i] == pytest.approx(want[i], abs=1e-3), i


def np_katz(n, pairs, alpha=0.1, beta=1.0, iters=15):
    A = np.zeros((n, n))
    for a, b in pairs:
        A[a, b] = 1.0
    x = np.full(n, beta)
    for _ in range(iters):
        x = alpha * (A.T @ x) + beta
    return x


def test_katz_vs_numpy(spark):
    from graftlink.spectral import katz_centrality

    pairs = [(a, b) for a, b in er_edges(30, 0.1, 5) if a != b]
    n = 30
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r.id: r.katz
        for r in katz_centrality(edges_df(spark, pairs), vertices=verts).collect()
    }
    want = np_katz(n, pairs)
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_eigenvector_weighted_vs_numpy(spark):
    from pyspark.sql import functions as F

    pairs = karate_edges()
    w = {(a, b): (a % 7 + b % 3 + 1.0) for a, b in pairs}
    e = edges_df(spark, pairs).withColumn(
        "weight", (F.col("src") % 7 + F.col("dst") % 3 + 1).cast("double")
    )
    got = {r.id: r.centrality for r in
           eigenvector_centrality(e, vertices=spark.range(34), tol=1e-12,
                                  max_iter=400, weight_col="weight").collect()}
    A = np.zeros((34, 34))
    for (a, b), wv in w.items():
        A[a, b] += wv
        A[b, a] += wv
    x = np.ones(34)
    for _ in range(600):
        x = A @ x
        x /= np.linalg.norm(x)
    x /= x.max()
    for i in range(34):
        assert got[i] == pytest.approx(x[i], abs=1e-3), i


def test_hits_weighted_vs_numpy(spark):
    from pyspark.sql import functions as F

    pairs = [(a, b) for a, b in er_edges(30, 0.12, 4) if a != b]
    e = edges_df(spark, pairs).withColumn(
        "weight", (F.col("src") % 7 + F.col("dst") % 3 + 1).cast("double")
    )
    got = {r.id: (r.hub, r.authority) for r in
           hits(e, tol=1e-12, max_iter=200, weight_col="weight").collect()}
    n = 30
    A = np.zeros((n, n))
    for a, b in pairs:
        A[a, b] += a % 7 + b % 3 + 1.0
    h = np.ones(n)
    for _ in range(400):
        a_vec = A.T @ h
        h = A @ a_vec
        h /= np.linalg.norm(h) or 1.0
    a_vec = A.T @ h
    h_n = h / (h.max() or 1.0)
    a_n = a_vec / (a_vec.max() or 1.0)
    ids = sorted(got)
    for i in ids:
        assert got[i][0] == pytest.approx(h_n[i], abs=1e-3), ("hub", i)
        assert got[i][1] == pytest.approx(a_n[i], abs=1e-3), ("auth", i)
