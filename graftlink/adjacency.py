"""CSR-like adjacency blocks — the engine's analogue of igraph's
oi/os out-index (igraph@0.10.x src/graph/type_indexededgelist.c).

`pack_adjacency` turns the long-form edge table into
`adj(src long, neighbors array<long>, out_deg long)` hash-partitioned
by src into exactly B buckets. B == spark.sql.shuffle.partitions, so
every downstream groupBy/join output is co-partitioned with adj and
the per-superstep `adj join state` needs NO exchange (SURVEY.md
§4.2.3) — the only shuffle per superstep is the contribution reduce.

Hub handling: a src whose neighbor list exceeds `max_block` is split
into multiple adjacency rows (`slice` on the packed array, JVM-side),
bounding Arrow batch memory in the scatter kernel; `out_deg` stays
the FULL degree so rank/out_deg is correct per chunk (SURVEY.md
§4.2.4). Results are provably independent of max_block (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_BLOCK = 100_000


def pack_adjacency(
    edges: DataFrame,
    buckets: int | None = None,
    max_block: int = DEFAULT_MAX_BLOCK,
    undirected: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """edges DF[src, dst] -> adj DF[src, neighbors, out_deg]
    (+ `wnorm: array<double>` aligned with neighbors when weight_col
    is given — per-src weights normalized to sum 1, the weighted-
    PageRank transition row).

    undirected=True packs the union of both orientations (CC/LPA view);
    multi-edges are preserved as repeated neighbors (igraph semantics:
    a multi-edge contributes twice).
    """
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if weight_col is None:
        e = edges.select("src", "dst")
        if undirected:
            e = e.unionAll(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        packed = (
            e.repartition(b, "src")
            .groupBy("src")
            .agg(
                F.sort_array(F.collect_list("dst")).alias("neighbors"),
                F.count("*").alias("out_deg"),
            )
        )
    else:
        e = edges.select(
            "src", "dst", F.col(weight_col).cast("double").alias("_w")
        )
        if undirected:
            e = e.unionAll(
                edges.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"),
                    F.col(weight_col).cast("double").alias("_w"),
                )
            )
        # sort_array on struct(dst, w) keeps the two arrays aligned
        packed = (
            e.repartition(b, "src")
            .groupBy("src")
            .agg(
                F.sort_array(F.collect_list(F.struct("dst", "_w"))).alias("_nb"),
                F.count("*").alias("out_deg"),
            )
            .withColumn("neighbors", F.transform("_nb", lambda s: s["dst"]))
            .withColumn("_ws", F.transform("_nb", lambda s: s["_w"]))
            .withColumn(
                "_wsum", F.aggregate("_ws", F.lit(0.0), lambda a, w: a + w)
            )
            .withColumn(
                "wnorm",
                F.transform("_ws", lambda w: w / F.col("_wsum")),
            )
            .drop("_nb", "_ws", "_wsum")
        )
    # split hub rows into <= max_block chunks
    adj = packed.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("out_deg") - 1) / F.lit(max_block)).cast("int"),
            )
        ),
    ).withColumn(
        "neighbors",
        F.slice(F.col("neighbors"), F.col("_chunk") * max_block + 1, max_block),
    )
    if weight_col is not None:
        adj = adj.withColumn(
            "wnorm",
            F.slice(F.col("wnorm"), F.col("_chunk") * max_block + 1, max_block),
        )
    return adj.drop("_chunk")
