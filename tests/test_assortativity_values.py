"""igraph assortativity(values=): Pearson over both-direction edges;
brute numpy oracle + degree-reduction consistency."""

from __future__ import annotations

import numpy as np
import pytest

from graftlink.metrics import assortativity_values, degree_assortativity
from tests.conftest import edges_df
from tests.oracles import er_edges


def brute(pairs, attr):
    und = sorted({tuple(sorted(p)) for p in pairs if p[0] != p[1]})
    xs, ys = [], []
    for a, b in und:
        xs += [attr[a], attr[b]]
        ys += [attr[b], attr[a]]
    return round(float(np.corrcoef(xs, ys)[0, 1]), 8)


def test_matches_brute_numpy(spark):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(40, 0.1, 7)})
    nodes = sorted({v for e in pairs for v in e})
    attr = {v: float((v * 37) % 11 + 1) for v in nodes}
    vals = spark.createDataFrame(
        [(v, attr[v]) for v in nodes], "id long, x double"
    )
    got = assortativity_values(edges_df(spark, pairs), vals).collect()[0][0]
    assert got == pytest.approx(brute(pairs, attr), abs=1e-6)


def test_degree_attribute_reduces_to_degree_assortativity(spark):
    pairs = sorted({tuple(sorted(p)) for p in er_edges(40, 0.1, 13)})
    e = edges_df(spark, pairs)
    from pyspark.sql import functions as F

    from graftlink.vertices import degrees

    deg = degrees(e, "all").select(
        "id", F.col("degree").cast("double").alias("x")
    )
    a = assortativity_values(e, deg).collect()[0][0]
    b = degree_assortativity(e).collect()[0][0]
    assert a == pytest.approx(b, abs=1e-7)


def test_perfect_assortative(spark):
    # two cliques with constant-per-clique attribute -> corr = 1
    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    vals = spark.createDataFrame(
        [(v, 1.0) for v in range(4)] + [(v, 5.0) for v in range(10, 14)],
        "id long, x double",
    )
    got = assortativity_values(edges_df(spark, k1 + k2), vals).collect()[0][0]
    assert got == pytest.approx(1.0)
