"""Power-iteration PageRank, damping 0.85 (igraph parity op 1).

Semantics match igraph_personalized_pagerank's uniform-reset case
(igraph@0.10.x src/centrality/pagerank.c; Graphina's power-iteration
pagerank has the same update rule):

    r'[v] = (1-d)/n + d * ( sum_{u->v} r[u]/outdeg(u) + dangling/n )

Dangling (outdeg 0) vertices spread their mass uniformly, so sum(r)
stays 1 every iteration (igraph normalizes to sum 1; this conserves
it exactly). Convergence: L-inf delta < tol (default 1e-6 per
BASELINE.json north_rule).

Physical shape per superstep (SURVEY.md §3.2): co-partitioned
`adj join state` (NO exchange — both sides hash(src/id) into B
buckets) -> Arrow gather-scatter kernel -> ONE shuffle
(groupBy(dst), partial+final agg; map-side partial aggregation
absorbs in-degree hub skew) -> co-partitioned left join back onto the
vertex universe -> checkpoint (durable parquet + lineage, also
truncating the logical plan so it never grows with iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager
from graftlink.kernels import scatter
from graftlink.vertices import vertex_universe


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    buckets: int | None = None,
    max_block: int = 100_000,
    resume: bool = False,
    fingerprint: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """edges DF[src,dst] (+ optional vertices DF[id]) -> DF[id, rank].

    vertices defaults to all ids appearing at either endpoint; pass it
    explicitly to include isolated vertices (rank floor (1-d)/n).
    """
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = damping

    verts = (vertices or vertex_universe(edges)).select("id").repartition(b, "id")
    adj = pack_adjacency(edges, buckets=b, max_block=max_block).persist()
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg")
    )
    # static per-vertex frame: id + out_deg (0 => dangling)
    base = (
        verts.join(out_deg, "id", "left")
        .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .persist()
    )
    n = base.count()
    m = adj.agg(F.sum(F.size("neighbors"))).collect()[0][0] or 0
    has_dangling = base.filter(F.col("out_deg") == 0).limit(1).count() > 0

    mgr = CheckpointManager(
        checkpoint_dir, "pagerank", spark,
        input_fingerprint=fingerprint or "", mode=checkpoint_mode, buckets=b,
    )
    start_it = 0
    state = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_it = found[0] + 1
            state = mgr.load(found[0], "id").select("id", "out_deg", "rank")
    if state is None:
        state = base.withColumn("rank", F.lit(1.0 / n))
        state = state.localCheckpoint(eager=True)

    # one scan up front; inside the loop dangling mass + L-inf delta
    # both come from the single post-checkpoint stats scan (2 Spark
    # jobs per superstep total: materialize + stats agg)
    dangling = 0.0
    if has_dangling:
        dangling = (
            state.filter(F.col("out_deg") == 0).agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )

    iterations = 0
    delta = float("inf")
    for it in range(start_it, max_iter):
        joined = adj.select("src", "neighbors").join(
            state, adj["src"] == state["id"], "inner"
        ).select("neighbors", "out_deg", "rank")
        contrib = scatter(joined, "pagerank")
        pulled = contrib.groupBy("dst").agg(F.sum("contrib").alias("pull"))
        new_rank = F.lit((1.0 - d) / n) + F.lit(d) * (
            F.coalesce(F.col("pull"), F.lit(0.0)) + F.lit(dangling / n)
        )
        new_state = state.join(pulled, state["id"] == pulled["dst"], "left").select(
            "id", "out_deg", new_rank.alias("rank"),
            F.col("rank").alias("prev_rank"),
        )
        new_state = mgr.save(
            new_state, it, "id",
            counters={"edges_processed": int(m), "dangling_mass": dangling},
        )
        stats_row = new_state.agg(
            F.max(F.abs(F.col("rank") - F.col("prev_rank"))).alias("delta"),
            F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))).alias("dangling"),
        ).collect()[0]
        delta = stats_row["delta"]
        dangling = (stats_row["dangling"] or 0.0) if has_dangling else 0.0
        state = new_state.select("id", "out_deg", "rank")
        iterations = it + 1
        if delta < tol:
            break

    if stats is not None:
        stats.update(
            {"iterations": iterations, "delta": delta, "n": n, "m": int(m),
             "edges_processed": int(m) * max(iterations - start_it, 0)}
        )
    adj.unpersist()
    base.unpersist()
    return state.select("id", "rank")
