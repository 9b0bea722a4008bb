"""Single-source BFS distances — the frontier-superstep pattern.

igraph surface matched: `igraph_distances` / python `Graph.distances`
unweighted case (igraph@0.10.x src/paths/unweighted.c [unverified
file]) restricted to one source — the all-pairs form is deliberately
out of scope (BSP-hostile at web scale; SURVEY.md §2A).

Shape: frontier BFS as iterative semi-join — per level one
`frontier ⋈ adj` scatter + an anti-join against visited. The visited
set is the growing state (persist + truncate discipline via
CheckpointManager); level count = eccentricity of the source (web
graphs: tens). Not SQL-expressible (iterative) -> rows-only driver
check; pytest vs networkx shortest_path_length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager


def bfs_distances(
    edges: DataFrame,
    source: int,
    max_depth: int = 100,
    directed: bool = True,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, dist] — hop distance from `source`; unreachable vertices
    are absent (igraph reports inf; filter semantics are cleaner in a
    DataFrame API and invertible via an anti-join on the universe)."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = pack_adjacency(edges, buckets=b, undirected=not directed).persist()
    mgr = CheckpointManager(None, "bfs", spark, mode="local", buckets=b)

    visited = spark.createDataFrame([(source, 0)], "id long, dist int").repartition(
        b, "id"
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        # scatter the frontier one hop out
        nxt = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"], "inner")
            .select(F.explode("neighbors").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
        )
        visited, row = mgr.save(
            visited.unionByName(nxt), depth, "id", counters={"depth": depth},
            stats_cols=[
                F.sum((F.col("dist") == depth).cast("long")).alias("new_count")
            ],
        )
        if not row["new_count"]:
            break
        frontier = visited.where(F.col("dist") == depth)
    result = mgr.finalize(visited.select("id", "dist"))
    adj.unpersist()
    return result
