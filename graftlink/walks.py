"""Seeded deterministic random walks over the edge table.

igraph surface matched: `igraph_random_walk` / python
`Graph.random_walk(start, steps)` (igraph@0.10.x src/paths/
random_walk.c [unverified file]). igraph draws each step from its
RNG; a distributed, oracle-checkable engine replaces the RNG with a
seeded per-edge hash — the walk is still "uniform at each step" in
the hash-randomness sense, but reproducible run-to-run, across
partitionings, AND across engines (the DuckDB twin replays the same
arithmetic), which is what a 100 TB training pipeline (node2vec-style
corpus generation) actually needs from walks.

Next-hop rule at vertex v, step t of walk w:
    next = argmin over out-edges (v, d) of
           H(w, t, v, d) = (w*A1 + t*A2 + v*A3 + d*A4 + C) mod P
with ties broken by d (min struct order). For a fixed (w, t, v) the
hash induces a near-uniform random order on the out-neighbors, so
each is equally likely to be the argmin — the deterministic stand-in
for igraph's uniform draw (same design as the deterministic min-label
tie-breaks elsewhere in the engine, SURVEY.md §5.3).

Shape per step: ONE shuffle_hash join of the walker frontier with the
edge table on the current vertex + ONE min(struct) partial-agg keyed
by walk id. No windows, no neighbor arrays, no per-vertex indexing —
hub vertices fan out map-side and combine map-side, so the classic
"walker lands on a 10^7-degree hub" skew never concentrates on one
reducer. Walks that reach a sink (no out-edges) simply stop (their
rows end at that step; igraph errors instead — documented deviation,
the pipeline-friendly choice).

All arithmetic stays below int64 overflow under ANSI mode: every
multiplicand is pre-reduced mod P (P ~ 1e9, products <= ~1e18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 1_000_000_007
A1, A2, A3, A4, C = 2_654_435_761 % P, 40_503, 69_069, 1_103_515_245, 12_345


def _hash_expr(w, t, v, d):
    """Portable (walk, step, src, dst) -> [0, P) hash; identical
    arithmetic in the DuckDB twin."""
    term = (
        (w % P) * A1 + (t % P) * A2 + (v % P) * A3 + (d % P) * A4 + C
    )
    return term % P


def random_walks(
    edges: DataFrame,
    starts: DataFrame | list[int],
    steps: int,
    buckets: int | None = None,
    broadcast_frontier: bool | None = None,
) -> DataFrame:
    """DF[walk, step, vertex] — deterministic seeded walks.

    starts: DF[walk, vertex] (arbitrary walk ids) or a list of start
    vertex ids (walk id = start vertex). Row (w, 0, v0) is the start;
    a walk that hits a sink has no rows past its last vertex.

    Join strategy: the walker frontier never grows, so when it is
    small (a corpus-sampling job walks thousands-to-millions of
    walkers over billions of edges) broadcasting it keeps the edge
    table completely in place — zero edge shuffle per step, the only
    shuffle is the walk-keyed min reduce over the scattered frontier
    edges. With walker counts approaching the edge count, pass
    broadcast_frontier=False for the co-partitioned shuffle_hash plan.
    Default: broadcast for list starts and ≤1e6 walkers."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(b, "src")
        .localCheckpoint(eager=True)
    )
    if isinstance(starts, list):
        if broadcast_frontier is None:
            broadcast_frontier = len(starts) <= 1_000_000
        starts = spark.createDataFrame(
            [(int(v), int(v)) for v in starts], "walk long, vertex long"
        )
    elif broadcast_frontier is None:
        broadcast_frontier = starts.count() <= 1_000_000
    cur = starts.select("walk", F.col("vertex").alias("cur"))
    out: list[DataFrame] = [
        cur.select("walk", F.lit(0).alias("step"), F.col("cur").alias("vertex"))
    ]
    for t in range(1, steps + 1):
        h = _hash_expr(F.col("walk"), F.lit(t), F.col("cur"), F.col("dst"))
        if broadcast_frontier:
            scattered = e.join(F.broadcast(cur), cur["cur"] == e["src"], "inner")
        else:
            scattered = cur.join(
                e.hint("shuffle_hash"), cur["cur"] == e["src"], "inner"
            )
        nxt = (
            scattered.select("walk", h.alias("_h"), "dst")
            .groupBy("walk")
            .agg(F.min(F.struct("_h", "dst")).alias("_m"))
            .select("walk", F.col("_m.dst").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out.append(
            nxt.select(
                "walk", F.lit(t).alias("step"), F.col("cur").alias("vertex")
            )
        )
        cur = nxt
        if nxt.isEmpty():
            break
    res = out[0]
    for s in out[1:]:
        res = res.unionByName(s)
    return res.select("walk", F.col("step").cast("int").alias("step"), "vertex")


def random_walks_sql(clean: str, start_list: list[int], steps: int) -> str:
    """DuckDB twin: the same walk unrolled step-by-step with identical
    hash arithmetic; per-step argmin via row_number over (h, dst)."""
    starts = ", ".join(f"({v}, {v})" for v in start_list)
    layers = []
    for t in range(1, steps + 1):
        layers.append(
            f"""
        w{t} AS MATERIALIZED (
            SELECT walk, cur FROM (
                SELECT p.walk, e.dst AS cur,
                       row_number() OVER (
                           PARTITION BY p.walk
                           ORDER BY ((p.walk % {P}) * {A1} + ({t} % {P}) * {A2}
                                     + (p.cur % {P}) * {A3} + (e.dst % {P}) * {A4}
                                     + {C}) % {P}, e.dst
                       ) AS rn
                FROM w{t - 1} p JOIN e ON e.src = p.cur
            ) WHERE rn = 1
        )"""
        )
    chain = ",".join(layers)
    sels = "\n            UNION ALL ".join(
        f"SELECT walk, {t} AS step, cur AS vertex FROM w{t}"
        for t in range(1, steps + 1)
    )
    return f"""
        WITH
        clean AS ({clean}),
        e AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM clean WHERE src <> dst
        ),
        w0 AS (
            SELECT CAST(col0 AS BIGINT) AS walk,
                   CAST(col1 AS BIGINT) AS cur
            FROM (VALUES {starts})
        ),{chain}
        SELECT walk, CAST(step AS INT) AS step, vertex FROM (
            SELECT walk, 0 AS step, cur AS vertex FROM w0
            UNION ALL {sels}
        )
    """


def weighted_random_walks(
    edges: DataFrame,
    starts: DataFrame | list[int],
    steps: int,
    weight_col: str = "weight",
    buckets: int | None = None,
    broadcast_frontier: bool | None = None,
) -> DataFrame:
    """DF[walk, step, vertex] — seeded walks with weight-proportional
    next-hop choice (igraph `random_walk(weights=)`): at vertex v the
    probability of out-edge (v, d) is w(v,d) / W(v) EXACTLY, realized
    by integer inverse-CDF sampling —

        r = H(walk, t, v) mod W(v)
        next = the dst with the smallest dst-ascending cumulative
               weight strictly greater than r

    with H the engine's portable (A1..A3, C) poly-hash (no dst term —
    selection is positional). Weights must be POSITIVE INTEGERS
    (scale rationals upstream); parallel edges merge by weight sum.

    The prefix sums are built ONCE, window-free, as a JVM array fold
    over the per-src sorted adjacency (collect_list + sort_array +
    F.aggregate) and exploded back to edge rows; each step is then the
    unweighted path's exact shape — one frontier join + one
    min(struct) partial agg keyed by walk — so the hub-skew story is
    unchanged (map-side fan-out, map-side combine). The DuckDB twin
    replays the identical arithmetic with window prefix sums."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = F.col(weight_col).cast("long")
    e = (
        edges.select("src", "dst", w.alias("_w"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("_w").alias("_w"))
    )
    acc0 = F.struct(
        F.lit(0).cast("long").alias("run"),
        F.array().cast("array<struct<dst:bigint,cum:bigint>>").alias("out"),
    )
    cum = (
        e.groupBy("src")
        .agg(
            F.sort_array(F.collect_list(F.struct("dst", "_w"))).alias("_a"),
            F.sum("_w").alias("tot"),
        )
        .select(
            "src",
            "tot",
            F.explode(
                F.aggregate(
                    "_a",
                    acc0,
                    lambda acc, x: F.struct(
                        (acc["run"] + x["_w"]).alias("run"),
                        F.concat(
                            acc["out"],
                            F.array(
                                F.struct(
                                    x["dst"].alias("dst"),
                                    (acc["run"] + x["_w"]).alias("cum"),
                                )
                            ),
                        ).alias("out"),
                    ),
                    lambda acc: acc["out"],
                )
            ).alias("_x"),
        )
        .select("src", F.col("_x.dst").alias("dst"), F.col("_x.cum").alias("cum"), "tot")
        .repartition(b, "src")
        .localCheckpoint(eager=True)
    )
    if isinstance(starts, list):
        if broadcast_frontier is None:
            broadcast_frontier = len(starts) <= 1_000_000
        starts = spark.createDataFrame(
            [(int(v), int(v)) for v in starts], "walk long, vertex long"
        )
    elif broadcast_frontier is None:
        broadcast_frontier = starts.count() <= 1_000_000
    cur = starts.select("walk", F.col("vertex").alias("cur"))
    out: list[DataFrame] = [
        cur.select("walk", F.lit(0).alias("step"), F.col("cur").alias("vertex"))
    ]
    for t in range(1, steps + 1):
        h = (
            (F.col("walk") % P) * A1
            + (F.lit(t) % P) * A2
            + (F.col("cur") % P) * A3
            + C
        ) % P
        if broadcast_frontier:
            scattered = cum.join(F.broadcast(cur), cur["cur"] == cum["src"], "inner")
        else:
            scattered = cur.join(
                cum.hint("shuffle_hash"), cur["cur"] == cum["src"], "inner"
            )
        nxt = (
            scattered.select(
                "walk", "dst", "cum", (h % F.col("tot")).alias("_r")
            )
            .where(F.col("cum") > F.col("_r"))
            .groupBy("walk")
            .agg(F.min(F.struct("cum", "dst")).alias("_m"))
            .select("walk", F.col("_m.dst").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out.append(
            nxt.select(
                "walk", F.lit(t).alias("step"), F.col("cur").alias("vertex")
            )
        )
        cur = nxt
        if nxt.isEmpty():
            break
    res = out[0]
    for s in out[1:]:
        res = res.unionByName(s)
    return res.select("walk", F.col("step").cast("int").alias("step"), "vertex")


def weighted_random_walks_sql(
    weighted_sql: str, start_list: list[int], steps: int
) -> str:
    """DuckDB twin of weighted_random_walks: `weighted_sql` must yield
    (src, dst, weight); identical hash + inverse-CDF arithmetic with
    window prefix sums."""
    starts = ", ".join(f"({v}, {v})" for v in start_list)
    layers = []
    for t in range(1, steps + 1):
        h = (
            f"((p.walk % {P}) * {A1} + ({t} % {P}) * {A2}"
            f" + (p.cur % {P}) * {A3} + {C}) % {P}"
        )
        layers.append(
            f"""
        w{t} AS MATERIALIZED (
            SELECT walk, cur FROM (
                SELECT p.walk, c.dst AS cur,
                       row_number() OVER (
                           PARTITION BY p.walk ORDER BY c.cum
                       ) AS rn
                FROM w{t - 1} p
                JOIN cum c ON c.src = p.cur AND c.cum > ({h}) % c.tot
            ) WHERE rn = 1
        )"""
        )
    chain = ",".join(layers)
    sels = "\n            UNION ALL ".join(
        f"SELECT walk, {t} AS step, cur AS vertex FROM w{t}"
        for t in range(1, steps + 1)
    )
    return f"""
        WITH
        we AS MATERIALIZED (
            SELECT src, dst, sum(CAST(weight AS BIGINT)) AS w
            FROM ({weighted_sql}) WHERE src <> dst GROUP BY src, dst
        ),
        cum AS MATERIALIZED (
            SELECT src, dst,
                   sum(w) OVER (PARTITION BY src ORDER BY dst) AS cum,
                   sum(w) OVER (PARTITION BY src) AS tot
            FROM we
        ),
        w0 AS (
            SELECT CAST(col0 AS BIGINT) AS walk,
                   CAST(col1 AS BIGINT) AS cur
            FROM (VALUES {starts})
        ),{chain}
        SELECT walk, CAST(step AS INT) AS step, vertex FROM (
            SELECT walk, 0 AS step, cur AS vertex FROM w0
            UNION ALL {sels}
        )
    """
