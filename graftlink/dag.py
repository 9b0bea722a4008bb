"""DAG operators — topological layering over the edge table.

igraph surface matched: `igraph_topological_sorting` / python
`Graph.topological_sorting` (igraph@0.10.x src/misc/other.c /
src/constructors/dag-ish surface [unverified files]). igraph emits
ONE valid vertex order; a distributed engine emits the canonical
layering instead: `level(v)` = length of the longest directed path
ending at v (Kahn peel round). Any topological order is recoverable
as ORDER BY (level, id), and the layering itself is what a scheduler
or dependency pipeline actually wants (everything in one level is
mutually independent).

Shape: delta-frontier longest-path relaxation over the packed
adjacency — the same superstep as BFS but with a max-reduce:
level(v) <- max(level(v), max over in-neighbors u of level(u)+1).
Only vertices whose level CHANGED last round scatter, so round r
touches exactly the vertices at layer-distance r; rounds = longest
path length. Each round is one shuffle_hash join + one partial-agg
max groupBy — no sort, skew absorbed by map-side combine.

Cycle detection (igraph errors on non-DAGs): in a DAG no level can
reach n; the loop raises after n rounds / when a level exceeds n-1,
which a cycle forces (levels on a cycle grow without bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager
from graftlink.vertices import vertex_universe


def topo_levels(
    edges: DataFrame,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    mode: str = "local",
) -> DataFrame:
    """DF[id, level] — Kahn/longest-path layering of a directed
    acyclic edge table. Raises ValueError if the input has a cycle.

    level(v) = 0 for sources (no in-edges); else
    1 + max(level(u)) over in-neighbors u. Deterministic.
    """
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = pack_adjacency(edges, buckets=b).persist()
    verts = vertex_universe(edges)
    n = verts.count()
    mgr = CheckpointManager(checkpoint_dir, "topo", spark, mode=mode, buckets=b)

    lev = verts.withColumn("level", F.lit(0).cast("int")).repartition(b, "id")
    frontier = lev  # rows whose level changed last round
    rounds = 0
    while True:
        rounds += 1
        if rounds > n + 1:
            adj.unpersist()
            mgr.release()
            raise ValueError(
                f"topo_levels: no fixpoint after {n + 1} rounds — the "
                "input graph has a directed cycle (a DAG's longest "
                "path is < n)"
            )
        # scatter level+1 from the changed frontier to out-neighbors;
        # max-reduce is partial-agg (hub in-degree absorbed map-side)
        cand = (
            adj.select("src", "neighbors")
            .join(
                frontier.hint("shuffle_hash"), adj["src"] == frontier["id"], "inner"
            )
            .select(
                F.explode("neighbors").alias("id"),
                (F.col("level") + 1).alias("cand"),
            )
            .groupBy("id")
            .agg(F.max("cand").alias("cand"))
        )
        upd = lev.join(cand.hint("shuffle_hash"), "id", "left").select(
            "id",
            F.greatest("level", F.coalesce("cand", "level")).alias("level"),
            (F.coalesce("cand", F.lit(-1)) > F.col("level")).alias("_chg"),
        )
        lev, row = mgr.save(
            upd,
            rounds,
            "id",
            counters={"round": rounds},
            stats_cols=[F.sum(F.col("_chg").cast("long")).alias("changed")],
        )
        if not row["changed"]:
            break
        frontier = lev.where("_chg")
    result = mgr.finalize(lev.select("id", F.col("level").cast("int").alias("level")))
    adj.unpersist()
    return result


def topo_levels_sql(dag_edges: str) -> str:
    """DuckDB twin: longest-path layering as a recursive CTE.
    `dag_edges` must yield (a, b) directed acyclic pairs. UNION
    dedups (id, lvl) pairs, so the recursion enumerates every
    distinct path length per vertex (bounded by n * depth rows) and
    the final max-groupBy picks the layering — exact, terminates on
    any DAG."""
    return f"""
        WITH RECURSIVE dag AS MATERIALIZED ({dag_edges}),
        verts AS MATERIALIZED (
            SELECT a AS id FROM dag UNION SELECT b FROM dag
        ),
        lp(id, lvl) AS (
            SELECT id, 0 FROM verts
            UNION
            SELECT e.b, lp.lvl + 1 FROM lp JOIN dag e ON e.a = lp.id
        )
        SELECT id, CAST(max(lvl) AS INT) AS level FROM lp GROUP BY id
    """


def is_dag(edges: DataFrame) -> bool:
    """True iff the directed edge table is acyclic (igraph
    `Graph.is_dag`); runs the layering and catches the cycle error."""
    try:
        topo_levels(edges).count()
        return True
    except ValueError:
        return False
