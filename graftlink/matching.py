"""Deterministic distributed maximal matching.

igraph's matching surface is `maximum_bipartite_matching`
(`igraph@0.10.x:src/misc/matching.c`, public anchor) — an EXACT
maximum matching via Hopcroft-Karp-style augmenting paths, which are
inherently sequential (each phase walks alternating paths whose shape
depends on every previous augmentation).  At link-graph scale the
engine ships the scalable greedy half-approximation instead: the
LOCALLY-MINIMAL-EDGE matching (the Israeli–Itai synchronous shape with
fixed hash priorities), with the classic guarantee |M| >= |M*| / 2 —
a documented deviation, ledgered in SURVEY.md §2A alongside MIS.

Round r over the shrinking active edge table E(a < b):
  1. per-edge priority p(e) = (eh, a, b), eh = (pri(a)*31 + pri(b)) mod P
     on the portable poly-hash `mis._pri`; the (a, b) tie-break keeps
     the order strictly TOTAL even when eh collides (the mis.py 64-bit
     id lesson — without it two adjacent colliding edges could both
     stall, neither a strict local min);
  2. an edge whose priority is the minimum among active edges incident
     to BOTH endpoints joins the matching (two adjacent edges can never
     both win: at the shared vertex only one is the min);
  3. matched vertices retire; edges touching them are dropped.

Determinism / twin contract: the result EQUALS the sequential greedy
matching that scans edges in ascending (eh, a, b) order — the globally
minimal active edge is locally minimal everywhere, is matched by both
procedures, and removing its endpoints commutes with the rest of the
scan (induction, the same argument that makes Luby-MIS equal
priority-order greedy MIS).  The DuckDB twin replays the synchronous
rounds with unrolled MATERIALIZED layers (rounds past convergence are
idempotent — the coloring_sql pattern; WITH RECURSIVE mis-evaluates
this round operator in DuckDB 1.x).

Scale shape: each round is one map-side-combining per-vertex min over
2|E| incidence rows + two semi/anti joins; at least the global-min
edge matches every round and in expectation a constant fraction of
vertices retire, so rounds are O(log m).  No Window, no UDF, no
driver-side state beyond the 1-row convergence counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graftlink.mis import P, _pri, _pri_sql


def _edge_pri(a, b) -> F.Column:
    eh = F.pmod(_pri(a) * F.lit(31) + _pri(b), F.lit(P))
    return F.struct(eh.alias("_h"), a.alias("_a"), b.alias("_b"))


def maximal_matching(
    edges: DataFrame,
    max_rounds: int = 64,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
) -> DataFrame:
    """DF[a, b] — the matched edges (a < b) of the deterministic
    greedy maximal matching on the simple undirected view.

    With `checkpoint_dir`, the per-round edge state DF[a, b, st]
    (0 active, 1 matched; covered edges drop out) is durably saved
    with lineage + counters; resume=True continues a killed run."""
    from graftlink.checkpoint import CheckpointManager

    spark = edges.sparkSession
    b_ = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    mgr = CheckpointManager(
        checkpoint_dir, "matching", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=b_,
    )
    state = None
    start_round = 1
    if resume:
        found = mgr.latest()
        if found is not None:
            start_round = found[0] + 1
            state = mgr.load(found[0], "a")
    if state is None:
        und = (
            edges.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        state = und.select("a", "b", F.lit(0).alias("st")).repartition(b_, "a")

    for rnd in range(start_round, max_rounds + 1):
        e = state.where(F.col("st") == 0)
        p = _edge_pri(F.col("a"), F.col("b")).alias("p")
        ep = e.select("a", "b", p)
        inc = ep.select(F.col("a").alias("id"), "p").unionAll(
            ep.select(F.col("b").alias("id"), "p")
        )
        minp = inc.groupBy("id").agg(F.min("p").alias("mp"))
        m_new = (
            ep.join(
                minp.select(F.col("id").alias("a"), F.col("mp").alias("ma")).hint(
                    "shuffle_hash"
                ),
                "a",
            )
            .join(
                minp.select(F.col("id").alias("b"), F.col("mp").alias("mb")).hint(
                    "shuffle_hash"
                ),
                "b",
            )
            .where((F.col("p") == F.col("ma")) & (F.col("p") == F.col("mb")))
            .select("a", "b")
        )
        mv = (
            m_new.select(F.col("a").alias("id"))
            .unionAll(m_new.select(F.col("b").alias("id")))
            .localCheckpoint(eager=True)
        )
        kept = (
            e.join(
                mv.withColumnRenamed("id", "a").hint("shuffle_hash"),
                "a", "left_anti",
            )
            .join(
                mv.withColumnRenamed("id", "b").hint("shuffle_hash"),
                "b", "left_anti",
            )
            .select("a", "b", F.lit(0).alias("st"))
        )
        upd = (
            state.where(F.col("st") == 1)
            .select("a", "b", "st")
            .unionAll(m_new.select("a", "b", F.lit(1).alias("st")))
            .unionAll(kept)
        )
        state, row = mgr.save(
            upd, rnd, "a", counters={"round": rnd},
            stats_cols=[F.sum((F.col("st") == 0).cast("long")).alias("active")],
        )
        if not row["active"]:
            break
    else:
        residual = state.where(F.col("st") == 0).count()
        if residual:
            mgr.release()
            raise RuntimeError(
                f"matching did not converge in {max_rounds} rounds; "
                f"{residual} edges still active"
            )
    return mgr.finalize(state.where(F.col("st") == 1).select("a", "b"))


def maximal_matching_sql(clean: str, rounds: int = 40) -> str:
    """DuckDB twin: unrolled synchronous rounds (idempotent past
    convergence — exact whenever the Spark side converges within
    `rounds`; it raises otherwise, so a silent divergence is
    impossible)."""
    eh = (
        f"(({_pri_sql('a')}) * 31 + ({_pri_sql('b')})) % {P}"
    )

    def layer(t: int) -> str:
        prev = f"e{t - 1}"
        return f"""
        mv{t} AS MATERIALIZED (
            SELECT id, min(ROW(eh, a, b)) AS mp FROM (
                SELECT a AS id, eh, a, b FROM {prev}
                UNION ALL SELECT b, eh, a, b FROM {prev}
            ) GROUP BY id
        ),
        m{t} AS MATERIALIZED (
            SELECT e.a, e.b FROM {prev} e
            JOIN mv{t} va ON va.id = e.a
            JOIN mv{t} vb ON vb.id = e.b
            WHERE ROW(e.eh, e.a, e.b) = va.mp
              AND ROW(e.eh, e.a, e.b) = vb.mp
        ),
        e{t} AS MATERIALIZED (
            SELECT e.* FROM {prev} e
            WHERE NOT EXISTS (
                SELECT 1 FROM m{t} m
                WHERE m.a IN (e.a, e.b) OR m.b IN (e.a, e.b)
            )
        )"""

    chain = ",".join(layer(t) for t in range(1, rounds + 1))
    acc = " UNION ALL ".join(
        f"SELECT a, b FROM m{t}" for t in range(1, rounds + 1)
    )
    return f"""
        WITH
        clean AS MATERIALIZED ({clean}),
        e0 AS MATERIALIZED (
            SELECT a, b, {eh} AS eh FROM (
                SELECT DISTINCT least(src, dst) AS a,
                       greatest(src, dst) AS b
                FROM clean WHERE src <> dst
            )
        ),{chain}
        SELECT a, b FROM ({acc})
    """
