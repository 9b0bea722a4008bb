"""k-truss — triangle-support peeling over the undirected edge table.

igraph surface matched: `igraph_trussness` / python `Graph.k_truss`-
style subgraph (igraph@0.10.x src/misc/trussness.c [unverified
file]); the k-truss is the maximal subgraph in which every edge
closes >= k-2 triangles WITHIN the subgraph — the standard
cohesive-core refinement of k-core used in web-scale graph mining
(Cohen 2008).

Shape: repeat { enumerate triangles on the surviving edge set via the
degree-oriented wedge join (graftlink/triangles.py — per-vertex
oriented out-degree O(sqrt m), power-law-safe); count per-edge
support with a partial-agg groupBy; drop edges below k-2 } until the
edge set stops shrinking. The edge set only shrinks, so round r costs
at most the round-(r-1) triangle join; rounds are bounded by the peel
depth. Every step is built-in joins/aggs in whole-stage codegen — no
kernels, no windows, no driver state beyond the per-round count.

The surviving set is localCheckpoint-ed per round because each round
references it three times (two wedge sides + closing join) — without
truncation the plan triples per round (memory: truncate_every=1 class
of loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.triangles import _closed_triangles


def _canonical_und(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def k_truss(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """DF[a, b] — edges of the k-truss (undirected canonical a < b).

    k <= 2 returns the whole simple undirected edge set (every edge
    is trivially in the 2-truss, igraph convention)."""
    if k <= 2:
        return _canonical_und(edges)
    und = _canonical_und(edges).localCheckpoint(eager=True)
    n_edges = und.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        tri = _closed_triangles(und.select(F.col("a").alias("src"), F.col("b").alias("dst")))
        # each triangle supports its three canonical edges
        sup = (
            tri.select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
            .unionAll(
                tri.select(
                    F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")
                )
            )
            .unionAll(
                tri.select(
                    F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")
                )
            )
            .groupBy("a", "b")
            .agg(F.count("*").alias("_sup"))
            .where(F.col("_sup") >= k - 2)
        )
        # inner join: support-less edges (no triangle at all) drop too
        kept = und.join(sup.select("a", "b"), ["a", "b"], "inner")
        kept = kept.localCheckpoint(eager=True)
        n_kept = kept.count()
        und.unpersist()
        und = kept
        if n_kept == n_edges:
            break
        n_edges = n_kept
    return und


def k_truss_sql(clean: str, k: int, rounds: int = 40) -> str:
    """DuckDB twin: the peel unrolled to a fixed `rounds` CTE chain —
    idempotent once the fixpoint is reached, so any rounds >= the
    true peel depth gives the exact k-truss. Triangle enumeration is
    the plain a<x<y three-way self-join — fine at oracle scale. Every
    layer is MATERIALIZED: DuckDB inlines multiply-referenced CTEs by
    default, which would re-expand the 4-reference round body
    4^rounds times (measured: rounds=4 already hangs un-materialized;
    rounds=40 runs in ~0.5 s materialized)."""
    s = k - 2
    layers = []
    for i in range(rounds):
        layers.append(
            f"""
        tri{i} AS MATERIALIZED (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e{i} e1
            JOIN e{i} e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN e{i} e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        sup{i} AS MATERIALIZED (
            SELECT a, b, count(*) AS s FROM (
                SELECT x AS a, y AS b FROM tri{i}
                UNION ALL SELECT x AS a, z AS b FROM tri{i}
                UNION ALL SELECT y AS a, z AS b FROM tri{i}
            ) GROUP BY a, b
        ),
        e{i + 1} AS MATERIALIZED (
            SELECT e.a, e.b FROM e{i} e
            JOIN sup{i} s ON s.a = e.a AND s.b = e.b
            WHERE s.s >= {s}
        )"""
        )
    chain = ",".join(layers)
    return f"""
        WITH
        clean AS ({clean}),
        e0 AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM clean WHERE src <> dst
        ),{chain}
        SELECT a, b FROM e{rounds}
    """
