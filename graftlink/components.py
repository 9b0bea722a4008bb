"""Connected components (weak) — igraph parity op 2.

igraph labels components in first-discovery order of a 0..n-1 vertex
scan (igraph@0.10.x src/connectivity/components.c), which after dense
renumbering equals labeling every vertex with the minimum vertex id
reachable from it. Both implementations below converge to exactly
that min-reachable-id labeling; `renumber=True` maps labels to dense
0..k-1 in ascending min-id order == igraph's numbering (SURVEY.md
§3.1 EP2).

Two algorithms (north_rule names both):

- `star` (default): large-star/small-star alternation (Kiveris et al.
  2014, "Connected Components in MapReduce and Beyond") on the raw
  edge pair table. O(log n) rounds, edge set shrinks every round —
  the 10^12-scale path. Pure built-in joins/aggs.
- `minlabel`: iterative min-label hash propagation over the packed
  undirected adjacency blocks — reuses the Arrow scatter kernel and
  per-iteration checkpoint/resume machinery; O(diameter) supersteps
  (web graphs: ~15). This is the resumable variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager
from graftlink.kernels import scatter
from graftlink.vertices import vertex_universe


def _renumber(labels: DataFrame) -> DataFrame:
    """label -> dense 0..k-1 by ascending label (= igraph scan order).
    Uses the two-pass ranker (no global window) — component count can
    approach n on sparse graphs."""
    from graftlink.vertices import dense_rank_ids

    mapping = dense_rank_ids(labels.select("label"), "label", out_col="component")
    return labels.join(mapping, "label").select("id", "component")


# ---------------------------------------------------------------------------
# large-star / small-star
# ---------------------------------------------------------------------------


def _large_star(e: DataFrame) -> DataFrame:
    nbrs = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    h = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v")).distinct()
    mins = h.groupBy("u").agg(F.min("v").alias("m"))
    attach = (
        h.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    roots = mins.select(F.col("u"), F.col("m").alias("v"))
    return attach.unionAll(roots).distinct()


def _labels_from_star_edges(e: DataFrame, verts: DataFrame) -> DataFrame:
    lab = e.groupBy("u").agg(F.min("v").alias("label"))
    return verts.join(
        lab.withColumnRenamed("u", "id"), "id", "left"
    ).select("id", F.coalesce("label", F.col("id")).alias("label"))


def _cc_star(edges: DataFrame, verts: DataFrame, max_iter: int) -> DataFrame:
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # one localCheckpoint materialization per round (star rounds
    # reference their input 4x, so plans would grow 4^r without it),
    # then convergence from ONE cheap reduce over the materialized
    # blocks: the (count, xor-of-edge-hashes) fingerprint. Round 1
    # instead ran count() + exceptAll() — a full extra shuffle of BOTH
    # edge sets every round. Equal count + equal 64-bit xor on
    # distinct sets is a ~2^-64 false-positive, far below any real
    # risk; the alternation's fixpoints are exactly the star graphs.
    prev_sig = None
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        row = new_e.agg(
            F.count("*").alias("c"),
            F.bit_xor(F.xxhash64("u", "v")).alias("fp"),
        ).collect()[0]
        sig = (row["c"], row["fp"])
        e = new_e
        if sig == prev_sig or row["c"] == 0:
            break
        prev_sig = sig
    return _labels_from_star_edges(e, verts)


# ---------------------------------------------------------------------------
# min-label hash propagation over adjacency blocks (resumable)
# ---------------------------------------------------------------------------


def _cc_minlabel(
    edges: DataFrame,
    verts: DataFrame,
    max_iter: int,
    buckets: int,
    checkpoint_dir: str | None,
    checkpoint_mode: str,
    resume: bool,
    fingerprint: str,
    scatter_engine: str = "jvm",
) -> DataFrame:
    spark = edges.sparkSession
    adj = pack_adjacency(edges, buckets=buckets, undirected=True).persist()
    mgr = CheckpointManager(
        checkpoint_dir, "components", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=buckets,
    )
    start_it = 0
    state = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_it = found[0] + 1
            state = mgr.load(found[0], "id")
    if state is None:
        # lazy repartition keeps hash(id, b) metadata for superstep 0
        # (localCheckpoint would drop it — see checkpoint.py)
        state = verts.select(
            "id", F.col("id").alias("label")
        ).repartition(buckets, "id")

    for it in range(start_it, max_iter):
        # shuffle_hash hints keep the cached adj un-sorted (see
        # pagerank.py); prev label is carried in-row so convergence is
        # one agg over the checkpointed state, not an extra join
        joined = adj.select("src", "neighbors").join(
            state.hint("shuffle_hash"), adj["src"] == state["id"], "inner"
        ).select("neighbors", "label")
        msgs = scatter(joined, "label", engine=scatter_engine)
        incoming = msgs.groupBy("dst").agg(F.min("label").alias("in_label"))
        new_state = (
            state.join(
                incoming.hint("shuffle_hash"), state["id"] == incoming["dst"], "left"
            )
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("in_label", F.col("label"))
                ).alias("label"),
                F.col("label").alias("prev_label"),
            )
        )
        new_state, stats_row = mgr.save(
            new_state, it, "id", counters={"iteration": it},
            stats_cols=[
                F.sum((F.col("label") != F.col("prev_label")).cast("long")).alias("c")
            ],
        )
        changed = stats_row["c"] or 0
        state = new_state.select("id", "label")
        if changed == 0:
            break
    result = mgr.finalize(state.select("id", "label"))
    adj.unpersist()
    return result


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    algo: str = "star",
    max_iter: int = 50,
    renumber: bool = True,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
    scatter_engine: str = "jvm",
) -> DataFrame:
    """edges DF[src,dst] -> DF[id, component] (weak components,
    direction ignored). component is dense 0..k-1 when renumber=True,
    else the min vertex id of the component."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (vertices or vertex_universe(edges)).select("id")
    if algo == "star":
        labels = _cc_star(edges, verts, max_iter)
    elif algo == "minlabel":
        labels = _cc_minlabel(
            edges, verts, max_iter, b, checkpoint_dir, checkpoint_mode,
            resume, fingerprint, scatter_engine,
        )
    else:
        raise ValueError(f"unknown cc algo: {algo}")
    if renumber:
        return _renumber(labels)
    return labels.select("id", F.col("label").alias("component"))
