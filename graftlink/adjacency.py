"""CSR-like adjacency blocks — the engine's analogue of igraph's
oi/os out-index (igraph@0.10.x src/graph/type_indexededgelist.c).

`pack_adjacency` turns the long-form edge table into
`adj(src long, neighbors array<long>, out_deg long)` hash-partitioned
by src into exactly B buckets. B == spark.sql.shuffle.partitions, so
every downstream groupBy/join output is co-partitioned with adj and
the per-superstep `adj join state` needs NO exchange (SURVEY.md
§4.2.3) — the only shuffle per superstep is the contribution reduce.

Hub-vertex skew (north_rule "salted repartitioning"): collect_list
has NO map-side combine, so without salting every edge of a hub src
funnels into ONE reducer task and one giant aggregation buffer — the
one place in the engine where partial aggregation doesn't absorb
power-law skew (sum/min/count reduces are skew-immune via partial
agg; the scatter side is bounded by the block split). The fix is the
two-phase salted pack: a cheap skew-immune degree pre-pass finds
srcs with deg > max_block (a tiny broadcast at web-graph power laws),
their edges get salt = hash(dst) mod ceil(deg/max_block), and the
pack groups by (src, salt) so no reducer sees more than ~max_block
rows; `out_deg` keeps the FULL degree so rank/out_deg stays correct
per chunk, and the final repartition(b, src) moves already-packed
array rows, never raw edges. Chunk sizes also bound Arrow batch
memory in the scatter kernel (SURVEY.md §4.2.4). Results are
independent of max_block (tested).
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
    normalize_weights: bool = True,
) -> DataFrame:
    """edges DF[src, dst] -> adj DF[src, neighbors, out_deg]
    (+ `wnorm: array<double>` aligned with neighbors when weight_col
    is given — per-src weights normalized to sum 1, the weighted-
    PageRank transition row; normalize_weights=False keeps the RAW
    weights in that column instead, the weighted-LPA vote row).

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
    else:
        e = edges.select("src", "dst", F.col(weight_col).cast("double").alias("_w"))
        if undirected:
            e = e.unionAll(
                edges.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"),
                    F.col(weight_col).cast("double").alias("_w"),
                )
            )

    # skew-immune degree pre-pass (partial-agg count; + weight sums
    # for the weighted transition row); only hub srcs are broadcast
    deg_aggs = [F.count("*").alias("_deg")]
    if weight_col is not None:
        deg_aggs.append(F.sum("_w").alias("_wsum"))
    deg = e.groupBy("src").agg(*deg_aggs)
    heavy = deg.where(F.col("_deg") > max_block)
    salted = e.join(F.broadcast(heavy), "src", "left").withColumn(
        "_salt",
        F.when(
            F.col("_deg").isNotNull(),
            F.pmod(F.xxhash64("dst"), F.ceil(F.col("_deg") / max_block).cast("long")),
        ).otherwise(F.lit(0)),
    )

    if weight_col is None:
        packed = (
            salted.groupBy("src", "_salt")
            .agg(
                F.sort_array(F.collect_list("dst")).alias("neighbors"),
                F.count("*").alias("_cnt"),
                F.first("_deg").alias("_deg"),
            )
            .select(
                "src", "neighbors",
                F.coalesce("_deg", F.col("_cnt")).alias("out_deg"),
            )
        )
    else:
        # sort_array on struct(dst, w) keeps the two arrays aligned;
        # weights normalize by the FULL per-src weight sum
        wsum_full = deg.select("src", "_wsum")
        packed = (
            salted.groupBy("src", "_salt")
            .agg(
                F.sort_array(F.collect_list(F.struct("dst", "_w"))).alias("_nb"),
                F.count("*").alias("_cnt"),
                F.first("_deg").alias("_hdeg"),
            )
            # shuffle_hash: SMJ would SORT the packed array rows; the
            # hashed build side is the tiny per-src (src, wsum) frame.
            # Only already-packed rows move here, never raw edges.
            .join(wsum_full.hint("shuffle_hash"), "src")
            .select(
                "src",
                F.transform("_nb", lambda s: s["dst"]).alias("neighbors"),
                (
                    F.transform("_nb", lambda s: s["_w"] / F.col("_wsum"))
                    if normalize_weights
                    else F.transform("_nb", lambda s: s["_w"])
                ).alias("wnorm"),
                F.coalesce("_hdeg", F.col("_cnt")).alias("out_deg"),
            )
        )
    # packed rows (arrays, <= ~max_block each), not raw edges, take the
    # final src-bucket exchange — the co-partitioning contract
    return packed.repartition(b, "src")
