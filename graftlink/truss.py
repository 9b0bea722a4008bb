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

# ---------------------------------------------------------------------------
# Full edge trussness via h-index propagation (no O(k_max) peel)
# ---------------------------------------------------------------------------


def trussness(
    edges: DataFrame,
    buckets: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """DF[a, b, trussness] — per-edge trussness: the largest k such
    that the edge survives in the k-truss (igraph_trussness; edges in
    no triangle get 2, the igraph convention).

    Same O(k_max)-free idea as coreness (kcore.py): the local
    h-index operator of Sariyüce–Seshadhri–Pinar ("Local algorithms
    for hierarchical dense subgraph discovery", VLDB 2018 — nucleus
    decomposition): init ρ(e) = triangle support; each round
    ρ'(e) = min(ρ(e), H({min(ρ(f), ρ(g)) : (e,f,g) a triangle})).
    The sequence is monotone non-increasing and its fixpoint is
    trussness−2 — rounds-to-converge supersteps instead of k_max
    sequential peel phases (thousands on a web graph).

    Scale shape: the triangle incidence table is enumerated ONCE with
    the degree-oriented wedge join (O(m^1.5), power-law-safe) and is
    static across rounds — each round is two shuffle_hash joins of
    per-edge state onto it, a least(), and the bounded counting-
    histogram H kernel from kcore.py (groupBy(edge, least(w, clip))
    partial-agg + a JVM array fold; no windows, hub edges combine
    map-side). Global clip: a (t+2)-truss needs ≥ (t+1)(t+2)/2 edges,
    so trussness−2 ≤ sqrt(2m) — same histogram bin bound as coreness.
    """
    import math

    from graftlink.checkpoint import CheckpointManager

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = _canonical_und(edges).localCheckpoint(eager=True)
    m = und.count()
    clip = int(math.isqrt(2 * m)) + 1
    tri = _closed_triangles(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    # incidence: one row per (edge, triangle) with the OTHER two edges
    def _pair(x, y):
        return [F.least(x, y), F.greatest(x, y)]

    uv, uw, vw = _pair("u", "v"), _pair("u", "w"), _pair("v", "w")

    def _inc(e, f, g):
        return tri.select(
            e[0].alias("a"), e[1].alias("b"),
            f[0].alias("fa"), f[1].alias("fb"),
            g[0].alias("ga"), g[1].alias("gb"),
        )

    # persist (NOT localCheckpoint: it drops partitioning metadata)
    # pre-partitioned by the first join key, so the per-round join of
    # state onto the big incidence side elides the incidence exchange
    # — only the per-edge state shuffles. Per-round shuffle budget:
    # one incidence-sized exchange for the second join + the
    # histogram groupBy; the skew-critical aggregations are the same
    # bounded-histogram kernel as coreness.
    inc = (
        _inc(uv, uw, vw)
        .unionAll(_inc(uw, uv, vw))
        .unionAll(_inc(vw, uv, uw))
        .repartition(b, "fa", "fb")
        .persist()
    )
    inc.count()
    mgr = CheckpointManager(None, "trussness", spark, mode="local", buckets=b)

    state = (
        inc.groupBy("a", "b")
        .agg(F.least(F.count("*"), F.lit(clip)).cast("long").alias("h"))
        .repartition(b, "a", "b")
    )
    sf = state  # edges that close >= 1 triangle
    for it in range(max_rounds):
        s1 = sf.select(
            F.col("a").alias("fa"), F.col("b").alias("fb"),
            F.col("h").alias("_h1"),
        )
        s2 = sf.select(
            F.col("a").alias("ga"), F.col("b").alias("gb"),
            F.col("h").alias("_h2"),
        )
        msgs = (
            inc.join(s1.hint("shuffle_hash"), ["fa", "fb"])
            .join(s2.hint("shuffle_hash"), ["ga", "gb"])
            .select("a", "b", F.least("_h1", "_h2").alias("w"))
        )
        cnts = msgs.groupBy("a", "b", "w").agg(F.count("*").alias("c"))
        hist = cnts.groupBy("a", "b").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("w").alias("wc"), "c")), asc=False
            ).alias("bins")
        )
        hh = hist.select(
            "a", "b",
            F.aggregate(
                "bins",
                F.struct(
                    F.lit(0).cast("long").alias("s"),
                    F.lit(0).cast("long").alias("best"),
                ),
                lambda acc, x: F.struct(
                    (acc["s"] + x["c"]).alias("s"),
                    F.greatest(
                        acc["best"], F.least(x["wc"], acc["s"] + x["c"])
                    ).alias("best"),
                ),
                lambda acc: acc["best"],
            ).alias("_new"),
        )
        upd = sf.join(hh.hint("shuffle_hash"), ["a", "b"], "left").select(
            "a", "b",
            F.least(F.col("h"), F.coalesce("_new", F.col("h"))).alias("h"),
            F.col("h").alias("_prev"),
        )
        upd, row = mgr.save(
            upd, it, "a", counters={"iteration": it},
            stats_cols=[
                F.sum((F.col("h") != F.col("_prev")).cast("long")).alias("chg")
            ],
        )
        sf = upd.select("a", "b", "h")
        if not row["chg"]:
            break
    result = und.join(sf.hint("shuffle_hash"), ["a", "b"], "left").select(
        "a", "b",
        (F.coalesce("h", F.lit(0)) + 2).cast("long").alias("trussness"),
    )
    out = mgr.finalize(result)
    inc.unpersist()
    return out


def trussness_sql(clean: str, rounds: int = 16) -> str:
    """DuckDB twin: the same h-index rounds UNROLLED (bounded layers,
    idempotent past convergence). H per edge via the classic sorted-
    rank form: H = max(least(w, rank)) over w desc — fine at oracle
    scale, no histogram needed."""
    layers = []
    for i in range(rounds):
        layers.append(
            f"""
        msg{i} AS MATERIALIZED (
            SELECT t.a, t.b, least(s1.h, s2.h) AS w
            FROM inc t
            JOIN s{i} s1 ON s1.a = t.fa AND s1.b = t.fb
            JOIN s{i} s2 ON s2.a = t.ga AND s2.b = t.gb
        ),
        hh{i} AS MATERIALIZED (
            SELECT a, b, max(least(w, rn)) AS hi FROM (
                SELECT a, b, w, row_number() OVER (
                    PARTITION BY a, b ORDER BY w DESC
                ) AS rn FROM msg{i}
            ) GROUP BY a, b
        ),
        s{i + 1} AS MATERIALIZED (
            SELECT s.a, s.b, least(s.h, coalesce(h.hi, s.h)) AS h
            FROM s{i} s
            LEFT JOIN hh{i} h ON h.a = s.a AND h.b = s.b
        )"""
        )
    chain = ",".join(layers)
    return f"""
        WITH
        clean AS ({clean}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM clean WHERE src <> dst
        ),
        tri AS MATERIALIZED (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM und e1
            JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        inc AS MATERIALIZED (
            SELECT x AS a, y AS b, x AS fa, z AS fb, y AS ga, z AS gb FROM tri
            UNION ALL
            SELECT x, z, x, y, y, z FROM tri
            UNION ALL
            SELECT y, z, x, y, x, z FROM tri
        ),
        s0 AS MATERIALIZED (
            SELECT a, b, count(*) AS h FROM inc GROUP BY a, b
        ),{chain}
        SELECT u.a, u.b, CAST(coalesce(s.h, 0) + 2 AS BIGINT) AS trussness
        FROM und u
        LEFT JOIN s{rounds} s ON s.a = u.a AND s.b = u.b
    """
