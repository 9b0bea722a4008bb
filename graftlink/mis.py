"""Maximal independent set (Luby) and greedy vertex coloring
(Jones–Plassmann) with deterministic portable-hash priorities.

igraph surface matched: `igraph_maximal_independent_vertex_sets`
(igraph@0.10.x src/misc/cliques-related [unverified file]; igraph
enumerates ALL maximal sets — exponential, a non-goal at web scale;
the distributed contract is ONE maximal set, the standard cluster
primitive) and `igraph_vertex_coloring_greedy`
(src/misc/coloring.c [unverified file]; igraph's default heuristic
colors vertices by a sequential order — ours is the parallel
Jones–Plassmann equivalent of greedy over a fixed random order).

Determinism: both algorithms replace the random permutation with a
portable priority hash pri(v) = ((v mod P) * A + C) mod P — a
bijection on [0, P) (A coprime to the prime P), so priorities are
DISTINCT for any dense id space and every tie-break is total. With a
fixed priority order:

- Luby's fixpoint == the sequential greedy MIS over ascending
  priority (v enters iff no smaller-priority neighbor entered) — so
  the result is a well-defined function of the graph, replayable by
  the DuckDB twin and by a 10-line Python reference.
- Jones–Plassmann == sequential greedy coloring over descending
  priority (each vertex takes the min color unused by
  higher-priority neighbors).

Shape per round (both): the surviving edge set only SHRINKS
(MIS: remove in+out vertices; JP: remove colored), every aggregation
is a partial-agg min/max keyed by vertex (hub fan-in combines
map-side), and candidate selection is a frontier-sized join — the
k-core-peel cost envelope, O(log n) expected rounds under hash
priorities. The JP min-missing-color pick is computed from DISTINCT
neighbor colors only (candidate k = {0} ∪ {c+1} anti-joined against
used colors), never a per-vertex sort or array — skew-immune on hub
vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 1_000_000_007
A = 2_654_435_761 % P
C = 824_633_702


def _pri(col):
    return F.pmod(F.pmod(col, F.lit(P)) * F.lit(A) + F.lit(C), F.lit(P))


def _pri_sql(expr: str) -> str:
    # CAST: VALUES-literal ids arrive as INT32 and (id % P) * A
    # overflows 32 bits
    return f"((CAST({expr} AS BIGINT) % {P}) * {A} + {C}) % {P}"


def _sym_nb(edges: DataFrame) -> DataFrame:
    """Symmetric simple neighbor table DF[u, v]."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def maximal_independent_set(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """DF[id, in_mis] — Luby rounds with fixed hash priorities:
    an active vertex enters the MIS iff its priority is smaller than
    every active neighbor's; entrants' neighbors retire. Isolated
    vertices are always in the MIS."""
    from graftlink.vertices import vertex_universe

    verts = (vertices or vertex_universe(edges)).select("id")
    nb = _sym_nb(edges).localCheckpoint(eager=True)
    active = verts.localCheckpoint(eager=True)
    winners: list[DataFrame] = []
    for _ in range(max_rounds):
        if active.isEmpty():
            break
        # min active-neighbor priority per active vertex (nb is kept
        # filtered to active×active, so no status join is needed)
        minp = nb.groupBy(F.col("u").alias("id")).agg(
            F.min(_pri(F.col("v"))).alias("_mn")
        )
        new_in = (
            active.join(minp, "id", "left")
            .where(F.col("_mn").isNull() | (_pri(F.col("id")) < F.col("_mn")))
            .select("id")
            .localCheckpoint(eager=True)
        )
        winners.append(new_in)
        out = (
            nb.join(new_in.withColumnRenamed("id", "u"), "u", "left_semi")
            .select(F.col("v").alias("id"))
            .distinct()
        )
        removed = new_in.unionByName(out)
        active = active.join(removed, "id", "left_anti").localCheckpoint(
            eager=True
        )
        nb = (
            nb.join(active.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(active.withColumnRenamed("id", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    else:
        if not active.isEmpty():
            raise RuntimeError(
                f"MIS did not converge in {max_rounds} rounds; "
                f"{active.count()} vertices still active"
            )
    if not winners:  # empty vertex set
        return verts.select("id", F.lit(False).alias("in_mis"))
    mis = winners[0]
    for w in winners[1:]:
        mis = mis.unionByName(w)
    return verts.join(
        mis.withColumn("_in", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("_in", F.lit(False)).alias("in_mis"))


def greedy_coloring(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """DF[id, color] — Jones–Plassmann: each round the uncolored
    local-priority-maxima take the smallest color unused among their
    already-colored neighbors. Proper coloring by construction (two
    adjacent vertices are never both local maxima)."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    verts = (vertices or vertex_universe(edges)).select("id")
    nb = _sym_nb(edges).localCheckpoint(eager=True)  # full, for messages
    nb_unc = nb  # filtered to uncolored×uncolored
    uncolored = verts.localCheckpoint(eager=True)
    # colors of colored neighbors of still-uncolored vertices,
    # accumulated as (id, color) message rows — total volume <= 2m
    seen = spark.createDataFrame([], "id long, color int")
    colored_frames: list[DataFrame] = []
    for _ in range(max_rounds):
        if uncolored.isEmpty():
            break
        maxp = nb_unc.groupBy(F.col("u").alias("id")).agg(
            F.max(_pri(F.col("v"))).alias("_mx")
        )
        cand = (
            uncolored.join(maxp, "id", "left")
            .where(F.col("_mx").isNull() | (_pri(F.col("id")) > F.col("_mx")))
            .select("id")
        )
        # min missing color from DISTINCT used colors: candidates
        # k ∈ {0} ∪ {used+1} minus used, min per vertex
        used = seen.join(cand, "id", "left_semi").distinct()
        cand_k = (
            cand.select("id", F.lit(0).alias("k"))
            .unionByName(used.select("id", (F.col("color") + 1).alias("k")))
        )
        pick = (
            cand_k.join(
                used.select("id", F.col("color").alias("k")), ["id", "k"], "left_anti"
            )
            .groupBy("id")
            .agg(F.min("k").cast("int").alias("color"))
            .localCheckpoint(eager=True)
        )
        colored_frames.append(pick)
        # message the new colors to uncolored neighbors
        msgs = (
            nb.join(pick.withColumnRenamed("id", "v"), "v")
            .select(F.col("u").alias("id"), "color")
        )
        uncolored = uncolored.join(pick, "id", "left_anti").localCheckpoint(
            eager=True
        )
        seen = (
            seen.unionByName(msgs)
            .join(uncolored, "id", "left_semi")
            .localCheckpoint(eager=True)
        )
        nb_unc = (
            nb_unc.join(uncolored.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(uncolored.withColumnRenamed("id", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    else:
        if not uncolored.isEmpty():
            raise RuntimeError(
                f"coloring did not converge in {max_rounds} rounds; "
                f"{uncolored.count()} vertices uncolored"
            )
    if not colored_frames:  # empty vertex set
        return verts.select("id", F.lit(0).cast("int").alias("color"))
    out = colored_frames[0]
    for fme in colored_frames[1:]:
        out = out.unionByName(fme)
    return out


# ---------------------------------------------------------------------------
# DuckDB twins — the same rounds as a recursive CTE (working table =
# previous round's state; aggregates/multi-references OK in DuckDB 1.0)
# ---------------------------------------------------------------------------


def mis_sql(clean: str, rounds: int = 64) -> str:
    pri_v = _pri_sql("n.v")
    pri_s = _pri_sql("s.id")
    pri_n2 = _pri_sql("n2.v")
    pri_nv = _pri_sql("n.v")
    new_in_self = f"""s.st = 'a' AND NOT EXISTS (
        SELECT 1 FROM nb n JOIN state t ON t.id = n.v
        WHERE n.u = s.id AND t.st = 'a' AND {pri_v} < {pri_s})"""
    new_in_nbr = f"""EXISTS (
        SELECT 1 FROM nb n JOIN state t ON t.id = n.v
        WHERE n.u = s.id AND t.st = 'a'
          AND NOT EXISTS (
            SELECT 1 FROM nb n2 JOIN state t2 ON t2.id = n2.v
            WHERE n2.u = n.v AND t2.st = 'a' AND {pri_n2} < {pri_nv}))"""
    return f"""
        WITH RECURSIVE
        clean AS MATERIALIZED ({clean}),
        verts AS MATERIALIZED (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM clean UNION ALL SELECT dst FROM clean
            )
        ),
        nb AS MATERIALIZED (
            SELECT least(src, dst) AS u, greatest(src, dst) AS v FROM clean
            UNION SELECT greatest(src, dst), least(src, dst) FROM clean
        ),
        state(r, id, st) AS (
            SELECT 0, id, 'a' FROM verts
            UNION ALL
            SELECT s.r + 1, s.id,
                   CASE WHEN s.st <> 'a' THEN s.st
                        WHEN {new_in_self} THEN 'i'
                        WHEN {new_in_nbr} THEN 'o'
                        ELSE 'a' END
            FROM state s
            WHERE s.r < {rounds}
              AND EXISTS (SELECT 1 FROM state WHERE st = 'a')
        )
        SELECT id, arg_max(st, r) = 'i' AS in_mis
        FROM state GROUP BY id
    """


def coloring_sql(clean: str, rounds: int = 64) -> str:
    pri_v = _pri_sql("n.v")
    pri_s = _pri_sql("s.id")
    is_cand = f"""s.color IS NULL AND NOT EXISTS (
        SELECT 1 FROM nb n JOIN state t ON t.id = n.v
        WHERE n.u = s.id AND t.color IS NULL AND {pri_v} > {pri_s})"""
    min_missing = f"""(
        SELECT min(k) FROM (
            SELECT 0 AS k
            UNION ALL
            SELECT t.color + 1 FROM nb n JOIN state t ON t.id = n.v
            WHERE n.u = s.id AND t.color IS NOT NULL
        ) cand
        WHERE k NOT IN (
            SELECT t2.color FROM nb n2 JOIN state t2 ON t2.id = n2.v
            WHERE n2.u = s.id AND t2.color IS NOT NULL
        ))"""
    return f"""
        WITH RECURSIVE
        clean AS MATERIALIZED ({clean}),
        verts AS MATERIALIZED (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM clean UNION ALL SELECT dst FROM clean
            )
        ),
        nb AS MATERIALIZED (
            SELECT least(src, dst) AS u, greatest(src, dst) AS v FROM clean
            UNION SELECT greatest(src, dst), least(src, dst) FROM clean
        ),
        state(r, id, color) AS (
            SELECT 0, id, CAST(NULL AS INT) FROM verts
            UNION ALL
            SELECT s.r + 1, s.id,
                   CASE WHEN s.color IS NOT NULL THEN s.color
                        WHEN {is_cand} THEN CAST({min_missing} AS INT)
                        ELSE NULL END
            FROM state s
            WHERE s.r < {rounds}
              AND EXISTS (SELECT 1 FROM state WHERE color IS NULL)
        )
        SELECT id, arg_max(color, r) AS color
        FROM state GROUP BY id
    """
