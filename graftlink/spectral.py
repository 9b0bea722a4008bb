"""Spectral centralities: HITS (hub/authority) and eigenvector
centrality — power iteration over the packed adjacency blocks.

igraph surface matched (empty checkout; upstream anchors per
SURVEY.md header convention):
- igraph_hub_score / igraph_authority_score
  (igraph@0.10.x src/centrality/centrality_other.c [unverified
  split]) — Kleinberg 1999: a = A^T h, h = A a, L2-normalized each
  round, both scaled so max = 1 (igraph convention).
- igraph_eigenvector_centrality (same file) — leading eigenvector of
  the (undirected view) adjacency, max-normalized to 1.

Physical shape: the PageRank superstep (cached adj ⋈ state via
shuffled-hash join, JVM explode scatter, one groupBy reduce) with
normalization DEFERRED: the update is linear, so state holds RAW
vectors, the driver holds the scale factor, and each round is
exactly one materialization job plus ONE stats collect — the agg
returns the new L2 norm together with the dot product against the
previous (normalized) vector, and convergence is the cosine distance
1 - <x_new, x_prev>/||x_new||. Same job-count discipline as
pagerank.py's mgr.save(stats_cols=...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager
from graftlink.vertices import vertex_universe


def _pull(adj: DataFrame, state: DataFrame, expr) -> DataFrame:
    """(dst, sum over incoming edges of expr(state-row))."""
    joined = adj.select("src", "neighbors").join(
        state.hint("shuffle_hash"), adj["src"] == state["id"], "inner"
    ).select("neighbors", expr.alias("_v"))
    msgs = joined.select(F.explode("neighbors").alias("dst"), "_v")
    return msgs.groupBy("dst").agg(F.sum("_v").alias("_pull"))


def _pull_w(adj: DataFrame, state: DataFrame, expr) -> DataFrame:
    """Weighted _pull: adj packed with weight_col (raw weights in the
    aligned `wnorm` array); each message is w(u,v) * expr(state-row).
    Same explode shape — arrays_zip keeps the pairing in one codegen'd
    projection, no join against an edge-weight table."""
    joined = adj.select("src", "neighbors", "wnorm").join(
        state.hint("shuffle_hash"), adj["src"] == state["id"], "inner"
    ).select("neighbors", "wnorm", expr.alias("_v"))
    msgs = joined.select(
        F.explode(F.arrays_zip("neighbors", "wnorm")).alias("z"), "_v"
    ).select(
        F.col("z.neighbors").alias("dst"),
        (F.col("z.wnorm") * F.col("_v")).alias("_v"),
    )
    return msgs.groupBy("dst").agg(F.sum("_v").alias("_pull"))


def _max_normalize(df: DataFrame, col: str) -> DataFrame:
    mx = df.agg(F.max(col)).collect()[0][0] or 1.0
    return df.withColumn(col, F.col(col) / F.lit(mx))


def hits(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    tol: float = 1e-9,
    buckets: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """DF[id, hub, authority] — igraph convention: both vectors scaled
    to max 1 at convergence. tol is on the cosine distance between
    successive normalized hub vectors. weight_col (igraph
    `hub_score(weights=)`): messages carry w(u,v), i.e. the iteration
    is on the weighted adjacency — the same edge weight serves A and
    A^T."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (vertices or vertex_universe(edges)).select("id").repartition(b, "id")
    wkw = dict(weight_col=weight_col, normalize_weights=False) if weight_col else {}
    pull = _pull_w if weight_col else _pull
    fwd = pack_adjacency(edges, buckets=b, **wkw).persist()  # src -> dsts
    rev_edges = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        *([F.col(weight_col)] if weight_col else []),
    )
    rev = pack_adjacency(rev_edges, buckets=b, **wkw).persist()

    # state: RAW hub values; driver holds the L2 scale h_norm.
    # CheckpointManager(local) gives the persist-based state discipline
    # of pagerank.py — per-iteration localCheckpoint chains degrade
    # quadratically (growing task binaries), persist + truncate-every-4
    # does not.
    mgr = CheckpointManager(None, "hits", spark, mode="local", buckets=b)
    state = verts.withColumn("hub", F.lit(1.0)).repartition(b, "id")
    h_norm = float(verts.count()) ** 0.5
    for it in range(max_iter):
        # a_raw = A^T (h_raw/h_norm);  h'_raw = A a_raw — the division
        # folds into the scatter expression, costing no extra pass
        auth_raw = pull(fwd, state, F.col("hub") / F.lit(h_norm)).withColumnRenamed(
            "dst", "id"
        )
        mid = verts.join(auth_raw, "id", "left").select(
            "id", F.coalesce("_pull", F.lit(0.0)).alias("auth_raw")
        )
        hub_raw = pull(rev, mid.select("id", "auth_raw"), F.col("auth_raw"))
        new_state = (
            mid.join(hub_raw.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id", "auth_raw",
                F.coalesce("_pull", F.lit(0.0)).alias("hub_raw"),
            )
            .join(
                state.select("id", (F.col("hub") / F.lit(h_norm)).alias("_ph")), "id"
            )
        )
        new_state, row = mgr.save(
            new_state, it, "id", counters={},
            stats_cols=[
                F.sqrt(F.sum(F.col("hub_raw") ** 2)).alias("nh"),
                F.sqrt(F.sum(F.col("auth_raw") ** 2)).alias("na"),
                F.sum(F.col("hub_raw") * F.col("_ph")).alias("dot"),
            ],
        )
        nh = row["nh"] or 1.0
        cos_delta = 1.0 - (row["dot"] or 0.0) / nh
        state = new_state.select(
            "id", F.col("hub_raw").alias("hub"),
            (F.col("auth_raw") / F.lit(row["na"] or 1.0)).alias("authority"),
        )
        h_norm = nh
        if abs(cos_delta) < tol:
            break
    state = mgr.finalize(state)
    fwd.unpersist()
    rev.unpersist()
    out = state.withColumn("hub", F.col("hub") / F.lit(h_norm))
    out = _max_normalize(_max_normalize(out, "hub"), "authority")
    return out.select("id", "hub", "authority")


def katz_centrality(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 15,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, katz] — x_{t+1} = alpha * A^T x_t + beta, x_0 = beta,
    run a FIXED iteration count (truncated Katz series; convergent
    for alpha < 1/lambda_max, and deterministic regardless so the
    bounded-round SQL twin mirrors it exactly). No normalization —
    the truncated series itself is the spec (networkx's normalized
    fixpoint variant differs by a scale; pytest pins the numpy dense
    iteration instead)."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (vertices or vertex_universe(edges)).select("id").repartition(b, "id")
    adj = pack_adjacency(edges, buckets=b).persist()
    mgr = CheckpointManager(None, "katz", spark, mode="local", buckets=b)
    state = verts.withColumn("x", F.lit(float(beta))).repartition(b, "id")
    for it in range(max_iter):
        pulled = _pull(adj, state, F.col("x")).withColumnRenamed("dst", "id")
        new_state = verts.join(pulled, "id", "left").select(
            "id",
            (F.lit(alpha) * F.coalesce("_pull", F.lit(0.0)) + F.lit(float(beta))).alias("x"),
        )
        state = mgr.save(new_state, it, "id", counters={"iteration": it})
    state = mgr.finalize(state)
    adj.unpersist()
    return state.select("id", F.col("x").alias("katz"))


def eigenvector_centrality(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 100,
    tol: float = 1e-9,
    buckets: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """DF[id, centrality] — leading eigenvector of the undirected
    adjacency, max-normalized to 1 (igraph_eigenvector_centrality,
    `weights=` supported: both orientations of an edge carry the SAME
    original weight, matching igraph's undirected view of a weighted
    directed edge list). tol is on the cosine distance between
    successive iterates."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (vertices or vertex_universe(edges)).select("id").repartition(b, "id")
    wkw = dict(weight_col=weight_col, normalize_weights=False) if weight_col else {}
    pull = _pull_w if weight_col else _pull
    adj = pack_adjacency(edges, buckets=b, undirected=True, **wkw).persist()

    mgr = CheckpointManager(None, "eigen", spark, mode="local", buckets=b)
    state = verts.withColumn("x", F.lit(1.0)).repartition(b, "id")
    x_norm = float(verts.count()) ** 0.5
    for it in range(max_iter):
        nxt_raw = pull(adj, state, F.col("x") / F.lit(x_norm)).withColumnRenamed(
            "dst", "id"
        )
        new_state = (
            verts.join(nxt_raw, "id", "left")
            .select("id", F.coalesce("_pull", F.lit(0.0)).alias("x_raw"))
            .join(state.select("id", (F.col("x") / F.lit(x_norm)).alias("_px")), "id")
        )
        new_state, row = mgr.save(
            new_state, it, "id", counters={},
            stats_cols=[
                F.sqrt(F.sum(F.col("x_raw") ** 2)).alias("nx"),
                F.sum(F.col("x_raw") * F.col("_px")).alias("dot"),
            ],
        )
        nx_ = row["nx"] or 1.0
        cos_delta = 1.0 - (row["dot"] or 0.0) / nx_
        state = new_state.select("id", F.col("x_raw").alias("x"))
        x_norm = nx_
        if abs(cos_delta) < tol:
            break
    state = mgr.finalize(state)
    adj.unpersist()
    out = state.withColumn("x", F.col("x") / F.lit(x_norm))
    return _max_normalize(out, "x").select("id", F.col("x").alias("centrality"))
