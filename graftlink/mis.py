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
DISTINCT for any dense id space. For sparse 64-bit id spaces the hash
can collide mod P, so every comparison uses the PAIR (pri(v), v) —
the id tie-break keeps the order strictly total in both engines
(struct ordering in Spark, ROW() comparison in DuckDB). With a
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
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
) -> DataFrame:
    """DF[id, in_mis] — Luby rounds with fixed hash priorities:
    an active vertex enters the MIS iff its priority is smaller than
    every active neighbor's; entrants' neighbors retire. Isolated
    vertices are always in the MIS.

    State per round is DF[id, st] (0 active, 1 in, 2 out), durably
    checkpointed with lineage when `checkpoint_dir` is set (north-rule
    resume contract); the shrinking active×active neighbor table is
    derived state, rebuilt from the loaded round on resume."""
    from graftlink.checkpoint import CheckpointManager
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (vertices or vertex_universe(edges)).select("id")
    nb_full = _sym_nb(edges).localCheckpoint(eager=True)
    mgr = CheckpointManager(
        checkpoint_dir, "mis", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=b,
    )

    start_round = 1
    state = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_round = found[0] + 1
            state = mgr.load(found[0], "id")
    if state is None:
        state = verts.select("id", F.lit(0).alias("st")).repartition(b, "id")
    active = state.where(F.col("st") == 0).select("id")
    nb = (
        nb_full.join(active.withColumnRenamed("id", "u"), "u", "left_semi")
        .join(active.withColumnRenamed("id", "v"), "v", "left_semi")
        .localCheckpoint(eager=True)
    )
    for rnd in range(start_round, max_rounds + 1):
        if active.isEmpty():
            break
        # min active-neighbor priority per active vertex (nb is kept
        # filtered to active×active, so no status join is needed).
        # Priority is the (hash, id) PAIR: the hash is bijective only
        # for ids < P, so for 64-bit id spaces the id tie-break keeps
        # the order strictly total — adjacent hash-collisions would
        # otherwise stall Luby (neither vertex a strict local min).
        minp = nb.groupBy(F.col("u").alias("id")).agg(
            F.min(
                F.struct(_pri(F.col("v")).alias("_p"), F.col("v").alias("_i"))
            ).alias("_mn")
        )
        own = F.struct(_pri(F.col("id")).alias("_p"), F.col("id").alias("_i"))
        new_in = (
            active.join(minp.hint("shuffle_hash"), "id", "left")
            .where(F.col("_mn").isNull() | (own < F.col("_mn")))
            .select("id")
            .localCheckpoint(eager=True)
        )
        out = (
            nb.join(
                new_in.withColumnRenamed("id", "u").hint("shuffle_hash"),
                "u", "left_semi",
            )
            .select(F.col("v").alias("id"))
            .distinct()
        )
        upd = state.join(
            new_in.withColumn("_i", F.lit(1)).hint("shuffle_hash"), "id", "left"
        ).join(
            out.withColumn("_o", F.lit(2)).hint("shuffle_hash"), "id", "left"
        ).select(
            "id",
            F.when(F.col("st") != 0, F.col("st"))
            .otherwise(F.coalesce("_i", "_o", F.lit(0)))
            .alias("st"),
        )
        state, row = mgr.save(
            upd, rnd, "id", counters={"round": rnd},
            stats_cols=[F.sum((F.col("st") == 0).cast("long")).alias("active")],
        )
        if not row["active"]:
            active = spark.createDataFrame([], "id long")
            break
        active = state.where(F.col("st") == 0).select("id")
        nb = (
            nb.join(
                active.withColumnRenamed("id", "u").hint("shuffle_hash"),
                "u", "left_semi",
            )
            .join(
                active.withColumnRenamed("id", "v").hint("shuffle_hash"),
                "v", "left_semi",
            )
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    else:
        if not active.isEmpty():
            mgr.release()
            raise RuntimeError(
                f"MIS did not converge in {max_rounds} rounds; "
                f"{active.count()} vertices still active"
            )
    return mgr.finalize(
        state.select("id", (F.col("st") == 1).alias("in_mis"))
    )


def greedy_coloring(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 64,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
) -> DataFrame:
    """DF[id, color] — Jones–Plassmann: each round the uncolored
    local-priority-maxima take the smallest color unused among their
    already-colored neighbors. Proper coloring by construction (two
    adjacent vertices are never both local maxima).

    Priority is LARGEST-DEGREE-FIRST with the hash as tie-break —
    lexicographic (degree, pri(v)) — matching igraph's classic greedy
    ordering heuristic AND fixing the power-law failure mode of pure
    hash priorities: a hub is the priority max of almost any
    neighborhood, so it colors in the first rounds instead of waiting
    for ~all its neighbors (measured: pure hash left 4% of a 2e5-edge
    power-law graph uncolored after 64 rounds; degree-first converges
    in ~15). Round count is bounded by the longest
    degree-descending path.

    State per round is DF[id, color] (NULL = uncolored), durably
    checkpointed with lineage when `checkpoint_dir` is set; the
    uncolored neighbor table and the colored-neighbor message rows are
    derived state, rebuilt from the loaded round on resume."""
    from graftlink.checkpoint import CheckpointManager
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (vertices or vertex_universe(edges)).select("id")
    nb = _sym_nb(edges).localCheckpoint(eager=True)  # full, for messages
    deg = nb.groupBy(F.col("u").alias("id")).agg(F.count("*").alias("_d"))
    mgr = CheckpointManager(
        checkpoint_dir, "coloring", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=b,
    )

    start_round = 1
    state = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_round = found[0] + 1
            state = mgr.load(found[0], "id")
    if state is None:
        state = verts.select(
            "id", F.lit(None).cast("int").alias("color")
        ).repartition(b, "id")
    uncolored = (
        state.where(F.col("color").isNull())
        .select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("_d", F.lit(0)).alias("_d"))
        .localCheckpoint(eager=True)
    )
    # degree-first priority rides ON the neighbor rows (dv baked in
    # once), so no per-round degree join
    nb_unc = (  # filtered to uncolored×uncolored
        nb.join(deg.select(F.col("id").alias("v"), F.col("_d").alias("_dv")), "v")
        .join(uncolored.select(F.col("id").alias("u")), "u", "left_semi")
        .join(uncolored.select(F.col("id").alias("v")), "v", "left_semi")
        .select("u", "v", "_dv")
        .localCheckpoint(eager=True)
    )
    # colors of colored neighbors of still-uncolored vertices,
    # accumulated as (id, color) message rows — total volume <= 2m
    seen = (
        nb.join(
            state.where(F.col("color").isNotNull()).withColumnRenamed("id", "v"),
            "v",
        )
        .join(uncolored.withColumnRenamed("id", "u"), "u", "left_semi")
        .select(F.col("u").alias("id"), "color")
        .localCheckpoint(eager=True)
    )
    for rnd in range(start_round, max_rounds + 1):
        if uncolored.isEmpty():
            break
        # (degree, hash, id) priority — id tie-break keeps the order
        # strictly total even when the hash collides mod P (64-bit ids)
        maxp = nb_unc.groupBy(F.col("u").alias("id")).agg(
            F.max(
                F.struct(
                    F.col("_dv"),
                    _pri(F.col("v")).alias("_p"),
                    F.col("v").alias("_i"),
                )
            ).alias("_mx")
        )
        own = F.struct(
            F.col("_d").alias("_dv"),
            _pri(F.col("id")).alias("_p"),
            F.col("id").alias("_i"),
        )
        cand = (
            uncolored.join(maxp, "id", "left")
            .where(F.col("_mx").isNull() | (own > F.col("_mx")))
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
            .agg(F.min("k").cast("int").alias("_new"))
            .localCheckpoint(eager=True)
        )
        upd = state.join(pick, "id", "left").select(
            "id", F.coalesce("color", "_new").alias("color")
        )
        state, row = mgr.save(
            upd, rnd, "id", counters={"round": rnd},
            stats_cols=[
                F.sum(F.col("color").isNull().cast("long")).alias("uncolored")
            ],
        )
        if not row["uncolored"]:
            uncolored = spark.createDataFrame([], "id long")
            break
        # message the new colors to uncolored neighbors
        msgs = (
            nb.join(pick.withColumnRenamed("id", "v"), "v")
            .select(F.col("u").alias("id"), F.col("_new").alias("color"))
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
            nb_unc.join(
                uncolored.select(F.col("id").alias("u")), "u", "left_semi"
            )
            .join(uncolored.select(F.col("id").alias("v")), "v", "left_semi")
            .select("u", "v", "_dv")
            .localCheckpoint(eager=True)
        )
    else:
        if not uncolored.isEmpty():
            mgr.release()
            raise RuntimeError(
                f"coloring did not converge in {max_rounds} rounds; "
                f"{uncolored.count()} vertices uncolored"
            )
    return mgr.finalize(
        state.where(F.col("color").isNotNull()).select("id", "color")
    )


# ---------------------------------------------------------------------------
# DuckDB twins — the same rounds as a recursive CTE (working table =
# previous round's state; aggregates/multi-references OK in DuckDB 1.0)
# ---------------------------------------------------------------------------


def mis_sql(clean: str, rounds: int = 64) -> str:
    pri_v = _pri_sql("n.v")
    pri_s = _pri_sql("s.id")
    pri_n2 = _pri_sql("n2.v")
    pri_nv = _pri_sql("n.v")
    # row comparison (hash, id) mirrors the Spark struct tie-break
    new_in_self = f"""s.st = 'a' AND NOT EXISTS (
        SELECT 1 FROM nb n JOIN state t ON t.id = n.v
        WHERE n.u = s.id AND t.st = 'a'
          AND ({pri_v}, n.v) < ({pri_s}, s.id))"""
    new_in_nbr = f"""EXISTS (
        SELECT 1 FROM nb n JOIN state t ON t.id = n.v
        WHERE n.u = s.id AND t.st = 'a'
          AND NOT EXISTS (
            SELECT 1 FROM nb n2 JOIN state t2 ON t2.id = n2.v
            WHERE n2.u = n.v AND t2.st = 'a'
              AND ({pri_n2}, n2.v) < ({pri_nv}, n.v)))"""
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


def coloring_sql(clean: str, rounds: int = 40) -> str:
    # Largest-degree-first with hash tie-break, folded into ONE scalar
    # prio = d * 2^31 + hash (hash < P < 2^31, so the fold is exactly
    # the lexicographic (d, hash) order); comparisons add the vertex
    # id as a final ROW() tie-break, mirroring the Spark struct, so
    # the order stays total even when the hash collides mod P.
    #
    # Shape note: UNROLLED bounded CTE layers (the random_walks_sql
    # pattern), NOT a recursive CTE — DuckDB 1.x mis-evaluates this
    # round operator inside WITH RECURSIVE in every formulation tried
    # (correlated EXISTS, aggregate-join; reproduced: state rows carry
    # prio values that exist in no pk row from round 2 on). Rounds
    # past convergence are idempotent, so a generous fixed depth is
    # exact whenever the Spark side converges within it.
    def layer(t: int) -> str:
        prev = f"st{t - 1}"
        used = f"""SELECT DISTINCT n.u, t.color
                   FROM nbp n JOIN {prev} t ON t.id = n.v
                   WHERE t.color IS NOT NULL"""
        return f"""
        st{t} AS MATERIALIZED (
            SELECT s.id, s.prio,
                   CASE WHEN s.color IS NOT NULL THEN s.color
                        WHEN mx.m IS NULL OR ROW(s.prio, s.id) > mx.m
                            THEN CAST(coalesce(mm.c, 0) AS INT)
                        ELSE NULL END AS color
            FROM {prev} s
            LEFT JOIN (
                SELECT n.u, max(ROW(n.prio_v, n.v)) AS m
                FROM nbp n JOIN {prev} t ON t.id = n.v
                WHERE t.color IS NULL GROUP BY n.u
            ) mx ON mx.u = s.id
            LEFT JOIN (
                SELECT ck.u, min(ck.k) AS c FROM (
                    SELECT id AS u, 0 AS k FROM pk
                    UNION ALL
                    SELECT u, color + 1 AS k FROM ({used})
                ) ck
                LEFT JOIN ({used}) ud
                  ON ud.u = ck.u AND ud.color = ck.k
                WHERE ud.color IS NULL
                GROUP BY ck.u
            ) mm ON mm.u = s.id
        )"""

    chain = ",".join(layer(t) for t in range(1, rounds + 1))
    return f"""
        WITH
        clean AS MATERIALIZED ({clean}),
        nb AS MATERIALIZED (
            SELECT least(src, dst) AS u, greatest(src, dst) AS v FROM clean
            UNION SELECT greatest(src, dst), least(src, dst) FROM clean
        ),
        pk AS MATERIALIZED (
            SELECT u AS id,
                   count(*) * 2147483648 + {_pri_sql("u")} AS prio
            FROM nb GROUP BY u
        ),
        nbp AS MATERIALIZED (
            SELECT n.u, n.v, pk.prio AS prio_v FROM nb n
            JOIN pk ON pk.id = n.v
        ),
        st0 AS MATERIALIZED (
            SELECT id, prio, CAST(NULL AS INT) AS color FROM pk
        ),{chain}
        SELECT id, color FROM st{rounds}
    """
