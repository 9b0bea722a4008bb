"""compare_communities parity: pure-Python oracle (direct published
formulas), igraph-documented edge cases, and bit-parity with the
DuckDB twin (the driver's hash path)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from graftlink.compare import compare_communities, compare_communities_sql


def _oracle(la: list[int], lb: list[int]) -> dict:
    """Direct formulas, independent association order (math.fsum)."""
    n = len(la)
    ct = Counter(zip(la, lb))
    ca, cb = Counter(la), Counter(lb)

    def h(cnt):
        return -math.fsum(c / n * math.log(c / n) for c in cnt.values())

    mi = math.fsum(
        v / n * math.log(n * v / (ca[i] * cb[j]))
        for (i, j), v in ct.items()
    )
    hx, hy = h(ca), h(cb)
    vi = hx + hy - 2 * mi
    nmi = 1.0 if hx + hy == 0 else 2 * mi / (hx + hy)
    c2 = lambda x: x * (x - 1) // 2
    sab = sum(c2(v) for v in ct.values())
    sa = sum(c2(v) for v in ca.values())
    sb = sum(c2(v) for v in cb.values())
    cn2 = c2(n)
    rand = (cn2 + 2 * sab - sa - sb) / cn2
    exp = sa * sb / cn2
    den = (sa + sb) / 2 - exp
    ari = 1.0 if den == 0 else (sab - exp) / den
    sj = (
        2 * n
        - sum(max(v for (i2, _), v in ct.items() if i2 == i) for i in ca)
        - sum(max(v for (_, j2), v in ct.items() if j2 == j) for j in cb)
    )
    return dict(vi=vi, nmi=nmi, rand=rand, adjusted_rand=ari, split_join=sj)


def _labels_df(spark, labels):
    return spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(labels)], "id long, label long"
    )


FIXTURES = [
    # (name, la, lb)
    ("identical", [0, 0, 1, 1, 2, 2], [5, 5, 9, 9, 1, 1]),
    ("refinement", [0, 0, 0, 0, 1, 1, 1, 1], [0, 0, 1, 1, 2, 2, 3, 3]),
    ("independent", [0, 0, 1, 1, 0, 0, 1, 1], [0, 1, 0, 1, 0, 1, 0, 1]),
    ("skewed", [0] * 9 + [1], [0] * 5 + [1] * 5),
]


@pytest.mark.parametrize("name,la,lb", FIXTURES)
def test_against_formula_oracle(spark, name, la, lb):
    row = (
        compare_communities(_labels_df(spark, la), _labels_df(spark, lb))
        .collect()[0]
        .asDict()
    )
    exp = _oracle(la, lb)
    assert row["n"] == len(la)
    assert row["split_join"] == exp["split_join"]
    for k in ("vi", "nmi", "rand", "adjusted_rand"):
        assert row[k] == pytest.approx(exp[k], abs=2e-6), (name, k)


def test_igraph_edge_cases(spark):
    # identical one-cluster partitions: nmi=1, vi=0, ari=1 (degenerate
    # denominator), rand=1, split_join=0
    one = _labels_df(spark, [7] * 5)
    r = compare_communities(one, one).collect()[0]
    assert (r["nmi"], r["vi"], r["rand"], r["adjusted_rand"], r["split_join"]) == (
        1.0, 0.0, 1.0, 1.0, 0,
    )
    # all-singletons vs all-singletons: same degenerate-ARI branch
    sing = _labels_df(spark, list(range(6)))
    r2 = compare_communities(sing, sing).collect()[0]
    assert r2["adjusted_rand"] == 1.0 and r2["vi"] == 0.0
    # singletons vs one-cluster: vi = ln n, nmi = 0
    onec = _labels_df(spark, [0] * 6)
    r3 = compare_communities(sing, onec).collect()[0]
    assert r3["vi"] == pytest.approx(math.log(6), abs=1e-6)
    assert r3["nmi"] == 0.0


def test_twin_bit_parity(spark):
    la = [0, 0, 0, 1, 1, 2, 2, 2, 2, 3, 3, 0, 1, 2]
    lb = [0, 1, 0, 1, 1, 2, 2, 0, 2, 3, 2, 1, 1, 2]
    sdf = compare_communities(
        _labels_df(spark, la), _labels_df(spark, lb)
    ).toPandas()
    a_sql = " UNION ALL ".join(
        f"SELECT {i} AS id, {l} AS label" for i, l in enumerate(la)
    )
    b_sql = " UNION ALL ".join(
        f"SELECT {i} AS id, {l} AS label" for i, l in enumerate(lb)
    )
    opdf = duckdb.sql(compare_communities_sql(a_sql, b_sql)).df()
    srow = sdf.iloc[0].to_dict()
    orow = opdf.iloc[0].to_dict()
    for k in ("n", "cells", "split_join"):
        assert int(srow[k]) == int(orow[k]), k
    for k in ("vi", "nmi", "rand", "adjusted_rand"):
        # the driver formats %.6g; the ordered folds make the doubles
        # bit-identical, so compare exactly
        assert float(srow[k]) == float(orow[k]), k
