"""Fundamental cycles of the undirected simple view w.r.t. the
deterministic BFS forest (round-4 verdict Missing #4, the tractable
slice of igraph's cycle-basis surface).

igraph surface matched: igraph_fundamental_cycles (igraph@0.10.x
src/cycles/fundamental_cycles.c [unverified — reference checkout is
empty]; python Graph.fundamental_cycles). igraph walks ONE
DFS tree and returns explicit vertex lists; the distributed
restatement uses the engine's deterministic BFS forest (min-id root
per component, min-predecessor parents) and returns ONE ROW PER
NON-TREE EDGE — the canonical representation of the fundamental
cycle it closes: (a, b, lca, cycle_len) with
cycle_len = dist(a) + dist(b) − 2·dist(lca) + 1. The cycle's vertex
list is recoverable by walking the parent table from a and b to the
lca; materializing every list is output-size physics (Σ cycle
lengths can reach m·diameter) and stays a caller choice, same
contract as path reconstruction.

`minimum_cycle_basis` itself stays on the deliberate-absence ledger:
Horton candidate generation distributes, but the GF(2) Gaussian
elimination that selects the basis is a sequential chain over the
candidate matrix. Fundamental cycles ARE a (non-minimum) cycle basis
of each component, which is the property most callers need.

Shape: BFS forest = one multi-source BFS (roots = per-component min
ids, driver-sized list); the LCA resolution is a lockstep walk —
per round, the deeper endpoint finger steps to its parent (both when
tied), so rounds ≤ max cycle half-length and state is ONE row per
non-tree edge throughout. Every loop join is shuffle_hash-hinted,
state goes through CheckpointManager (kill-resume pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.checkpoint import CheckpointManager


def _bfs_forest(edges: DataFrame):
    """(und DF[a,b], forest DF[id, dist, parent]) — deterministic BFS
    forest over the undirected simple view: roots are per-component
    min ids, parents are min-predecessors."""
    from graftlink.components import connected_components
    from graftlink.paths import multi_source_parents

    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cc = connected_components(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        renumber=False,
    )
    roots = [int(r[0]) for r in cc.select("component").distinct().collect()]
    forest = (
        multi_source_parents(
            und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            roots,
            directed=False,
        )
        .where(F.col("dist").isNotNull())
        .select("id", F.col("dist").cast("long").alias("dist"), "parent")
        .localCheckpoint(eager=True)
    )
    return und, forest


def fundamental_cycles(
    edges: DataFrame,
    max_rounds: int = 10_000,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    fingerprint: str = "",
) -> DataFrame:
    """DF[a, b, lca, cycle_len] — one row per non-tree edge (a < b)
    of the deterministic BFS forest; `lca` is the cycle's apex and
    `cycle_len` its edge count (2·k+1 forms are odd cycles through
    same-depth endpoints, parallel-path cycles are even)."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und, forest = _bfs_forest(edges)
    tree = forest.where(F.col("parent").isNotNull()).select(
        F.least("id", "parent").alias("a"),
        F.greatest("id", "parent").alias("b"),
    )
    nontree = und.join(tree.hint("shuffle_hash"), ["a", "b"], "left_anti")

    dist_of = forest.select("id", "dist")
    state = (
        nontree
        .join(
            dist_of.select(F.col("id").alias("a"), F.col("dist").alias("da")).hint(
                "shuffle_hash"
            ),
            "a",
        )
        .join(
            dist_of.select(F.col("id").alias("b"), F.col("dist").alias("db")).hint(
                "shuffle_hash"
            ),
            "b",
        )
        .select(
            "a", "b",
            F.col("a").alias("fa"), F.col("da").alias("ha"),
            F.col("b").alias("fb"), F.col("db").alias("hb"),
            (F.col("da") + F.col("db") + 1).alias("base_len"),
        )
        .repartition(b, "a", "b")
    )
    mgr = CheckpointManager(
        checkpoint_dir, "fundcycles", spark,
        input_fingerprint=fingerprint, buckets=b,
    )
    start_round = 0
    if resume and checkpoint_dir is not None:
        found = mgr.latest()
        if found is not None:
            start_round = found[0] + 1
            state = mgr.load(found[0], "a")
    par = forest.select(F.col("id").alias("_pid"), F.col("parent").alias("_pp"))
    for rnd in range(start_round, max_rounds):
        live = F.col("fa") != F.col("fb")
        step_a = live & (F.col("ha") >= F.col("hb"))
        step_b = live & (F.col("hb") >= F.col("ha"))
        nxt = (
            state
            .join(
                par.select(F.col("_pid").alias("fa"), F.col("_pp").alias("_pa")).hint(
                    "shuffle_hash"
                ),
                "fa", "left",
            )
            .join(
                par.select(F.col("_pid").alias("fb"), F.col("_pp").alias("_pb")).hint(
                    "shuffle_hash"
                ),
                "fb", "left",
            )
            .select(
                "a", "b", "base_len",
                F.when(step_a, F.col("_pa")).otherwise(F.col("fa")).alias("fa"),
                F.when(step_a, F.col("ha") - 1).otherwise(F.col("ha")).alias("ha"),
                F.when(step_b, F.col("_pb")).otherwise(F.col("fb")).alias("fb"),
                F.when(step_b, F.col("hb") - 1).otherwise(F.col("hb")).alias("hb"),
            )
        )
        state, row = mgr.save(
            nxt, rnd, "a", counters={"round": rnd},
            stats_cols=[
                F.sum((F.col("fa") != F.col("fb")).cast("long")).alias("live")
            ],
        )
        if not row["live"]:
            break
    else:
        raise RuntimeError(
            f"fundamental_cycles LCA walk exceeded {max_rounds} rounds"
        )
    # cycle_len = da + db + 1 − 2·dist(lca); dist(lca) is the walked
    # height ha (== hb at convergence)
    out = state.select(
        "a", "b",
        F.col("fa").alias("lca"),
        (F.col("base_len") - 2 * F.col("ha")).alias("cycle_len"),
    )
    return mgr.finalize(out)


def fundamental_cycles_sql(clean: str, max_depth: int = 64) -> str:
    """DuckDB twin: min-label components give the roots, a (v, d)
    deduped BFS gives depths, min-predecessor parents give the
    forest, per-vertex ancestor chains give the LCA (common ancestor
    of maximum depth)."""
    return f"""
        WITH RECURSIVE
        clean AS (SELECT src, dst FROM ({clean}) WHERE src <> dst),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM clean
        ),
        nb AS (SELECT a AS u, b AS v FROM und UNION SELECT b, a FROM und),
        verts AS (SELECT DISTINCT u AS id FROM nb),
        reach(id, r) AS (
            SELECT id, id FROM verts
            UNION
            SELECT n.v, rc.r FROM reach rc JOIN nb n ON n.u = rc.id
        ),
        lab AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
        roots AS (SELECT DISTINCT label AS id FROM lab),
        walk(v, d) AS (
            SELECT id, 0 FROM roots
            UNION
            SELECT n.v, w.d + 1 FROM walk w JOIN nb n ON n.u = w.v
            WHERE w.d < {max_depth}
        ),
        bfs AS (SELECT v, min(d) AS dist FROM walk GROUP BY v),
        parent AS (
            SELECT c.v AS id, min(n.u) AS parent
            FROM bfs c
            JOIN nb n ON n.v = c.v
            JOIN bfs p ON p.v = n.u AND p.dist = c.dist - 1
            WHERE c.dist > 0
            GROUP BY c.v
        ),
        tree AS (
            SELECT least(id, parent) AS a, greatest(id, parent) AS b
            FROM parent
        ),
        nontree AS (
            SELECT u.a, u.b FROM und u
            WHERE NOT EXISTS (
                SELECT 1 FROM tree t WHERE t.a = u.a AND t.b = u.b
            )
        ),
        anc(v0, node, dd) AS (
            SELECT b.v, b.v, b.dist FROM bfs b
            UNION
            SELECT a.v0, p.parent, a.dd - 1
            FROM anc a JOIN parent p ON p.id = a.node
        ),
        lca AS (
            SELECT nt.a, nt.b,
                   max_by(x.node, x.dd) AS lca,
                   max(x.dd) AS dlca
            FROM nontree nt
            JOIN anc x ON x.v0 = nt.a
            JOIN anc y ON y.v0 = nt.b AND y.node = x.node
            GROUP BY nt.a, nt.b
        )
        SELECT l.a, l.b, l.lca,
               da.dist + db.dist + 1 - 2 * l.dlca AS cycle_len
        FROM lca l
        JOIN bfs da ON da.v = l.a
        JOIN bfs db ON db.v = l.b
    """
