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
`adj join state` (shuffled-hash join, state is the build side; the
cached adjacency is never exchanged or sorted) -> gather-scatter
(JVM explode by default, Arrow numpy kernel via scatter_engine=
"arrow"; see kernels.scatter for the measured tradeoff) -> ONE
shuffle (groupBy(dst), partial+final agg; map-side partial
aggregation absorbs in-degree hub skew) -> co-partitioned left join
back onto the vertex universe -> state persist, with the convergence
stats computed in the same materialization job and plan lineage
truncated every 4 supersteps (exponential-plan guard) — durable mode
writes every iteration to parquet + lineage JSON instead (the resume
contract).
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
    scatter_engine: str = "jvm",
    weight_col: str | None = None,
    personalization: DataFrame | None = None,
) -> DataFrame:
    """edges DF[src,dst] (+ optional vertices DF[id]) -> DF[id, rank].

    vertices defaults to all ids appearing at either endpoint; pass it
    explicitly to include isolated vertices (rank floor (1-d)/n).

    weight_col: name of an edge weight column -> weighted PageRank
    (igraph_pagerank's `weights` arg): a vertex distributes rank to
    out-neighbors proportionally to edge weight.

    personalization: DF[id, p] reset distribution (normalized
    internally) -> personalized PageRank (igraph_personalized_pagerank
    / networkx `personalization=`); dangling mass is also
    redistributed by p (networkx convention). Vertices absent from the
    frame get p=0.
    """
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = damping

    verts = (vertices or vertex_universe(edges)).select("id").repartition(b, "id")
    adj = pack_adjacency(
        edges, buckets=b, max_block=max_block, weight_col=weight_col
    ).persist()
    scatter_kind = "pagerank" if weight_col is None else "pagerank_weighted"
    adj_cols = ["src", "neighbors"] + (["wnorm"] if weight_col else [])
    rank_cols = ["out_deg", "rank"] if weight_col is None else ["rank"]
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg")
    )
    # static per-vertex frame: id + out_deg (0 => dangling) + reset p
    # shuffle_hash (not broadcast) so the one-time base build stays
    # sort-free at scale; the explicit repartition pins the B-bucket
    # id-partitioning contract the supersteps rely on regardless of
    # spark.sql.shuffle.partitions
    base = verts.join(out_deg.hint("shuffle_hash"), "id", "left").select(
        "id", F.coalesce("out_deg", F.lit(0)).alias("out_deg")
    ).repartition(b, "id")
    if personalization is not None:
        psum = personalization.agg(F.sum("p")).collect()[0][0]
        base = base.join(
            personalization.select(
                "id", (F.col("p") / F.lit(psum)).alias("p")
            ).hint("shuffle_hash"),
            "id",
            "left",
        ).select("id", "out_deg", F.coalesce("p", F.lit(0.0)).alias("p"))
    base = base.persist()
    n = base.count()
    m = adj.agg(F.sum(F.size("neighbors"))).collect()[0][0] or 0
    has_dangling = base.filter(F.col("out_deg") == 0).limit(1).count() > 0

    mgr = CheckpointManager(
        checkpoint_dir, "pagerank", spark,
        input_fingerprint=fingerprint or "", mode=checkpoint_mode, buckets=b,
    )
    state_cols = ["id", "out_deg"] + (["p"] if personalization is not None else [])
    start_it = 0
    state = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_it = found[0] + 1
            state = mgr.load(found[0], "id").select(*state_cols, "rank")
    if state is None:
        # base is persisted with hash(id, b) partitioning; deriving the
        # initial state lazily keeps that metadata (a checkpoint here
        # would drop it and force an exchange in superstep 0)
        init_rank = F.col("p") if personalization is not None else F.lit(1.0 / n)
        state = base.withColumn("rank", init_rank)

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
    iter_walls: list[float] = []
    import time as _time

    for it in range(start_it, max_iter):
        _t0 = _time.monotonic()
        # shuffle_hash hints: state/pulled are the small build sides;
        # without them Catalyst picks sort-merge and re-sorts the
        # cached adjacency blocks EVERY superstep (measured 2-3x
        # per-iteration cost at 2e7 edges)
        joined = adj.select(*adj_cols).join(
            state.hint("shuffle_hash"), adj["src"] == state["id"], "inner"
        ).select(*(adj_cols[1:] + rank_cols))
        contrib = scatter(joined, scatter_kind, engine=scatter_engine)
        pulled = contrib.groupBy("dst").agg(F.sum("contrib").alias("pull"))
        pull_term = F.coalesce(F.col("pull"), F.lit(0.0))
        if personalization is not None:
            new_rank = F.lit(1.0 - d) * F.col("p") + F.lit(d) * (
                pull_term + F.lit(dangling) * F.col("p")
            )
        else:
            new_rank = F.lit((1.0 - d) / n) + F.lit(d) * (
                pull_term + F.lit(dangling / n)
            )
        new_state = state.join(
            pulled.hint("shuffle_hash"), state["id"] == pulled["dst"], "left"
        ).select(
            *state_cols, new_rank.alias("rank"),
            F.col("rank").alias("prev_rank"),
        )
        new_state, stats_row = mgr.save(
            new_state, it, "id",
            counters={"edges_processed": int(m), "dangling_mass": dangling},
            stats_cols=[
                F.max(F.abs(F.col("rank") - F.col("prev_rank"))).alias("delta"),
                F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))).alias("dangling"),
            ],
        )
        delta = stats_row["delta"]
        dangling = (stats_row["dangling"] or 0.0) if has_dangling else 0.0
        state = new_state.select(*state_cols, "rank")
        iterations = it + 1
        iter_walls.append(round(_time.monotonic() - _t0, 3))
        if delta < tol:
            break

    if stats is not None:
        stats.update(
            {"iterations": iterations, "delta": delta, "n": n, "m": int(m),
             "edges_processed": int(m) * max(iterations - start_it, 0),
             "iter_walls": iter_walls}
        )
    # materialize the final state BEFORE dropping the caches it was
    # computed from, then release the loop's persisted state (leak fix)
    result = mgr.finalize(state.select("id", "rank"))
    adj.unpersist()
    base.unpersist()
    return result
