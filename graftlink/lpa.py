"""Label propagation community detection — igraph parity op 3.

igraph's LPA (igraph@0.10.x src/community/label_propagation.c,
Raghavan–Albert–Kumara 2007) is RNG-dependent: async updates in a
random vertex order with random tie-breaks, so igraph itself is not
reproducible run-to-run. The parity contract (BASELINE.md row 6 /
SURVEY.md §2A) is therefore a deterministic spec of our own that
keeps the RAK fixed-point property:

  - synchronous supersteps; every vertex updates from the same
    snapshot;
  - a vertex's vote multiset = labels of all its neighbors
    (undirected view, multi-edges count) PLUS its own current label
    once (the self-vote breaks 2-cycles that make pure synchronous
    LPA oscillate);
  - new label = most frequent vote, ties broken by MINIMUM label;
  - stop when no vertex changes (or max_iter).

Same input => identical labels at any parallelism (integer ops only).
At convergence every vertex's label is a maximal vote in its
closed neighborhood — the validity property the tests assert.
Labels are renumbered 0..k-1 by ascending min member id, matching
igraph's VertexClustering presentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager
from graftlink.components import _renumber
from graftlink.kernels import scatter
from graftlink.vertices import vertex_universe


def label_propagation(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 30,
    renumber: bool = True,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
    stats: dict | None = None,
    scatter_engine: str = "jvm",
    weight_col: str | None = None,
    initial: DataFrame | None = None,
    fixed: DataFrame | None = None,
) -> DataFrame:
    """edges DF[src,dst] -> DF[id, community(long)].

    weight_col: edge weights (igraph's `weights=` arg) — a neighbor's
    vote counts its edge weight instead of 1; the self-vote keeps
    weight 1.0 so the weighted spec degrades to the unweighted one at
    all-ones weights. With integer-valued weights the vote sums are
    exact in doubles, so the DuckDB twin matches bit-for-bit.

    initial / fixed: igraph `community_label_propagation(initial=,
    fixed=)` semi-supervised surface. initial is DF[id, label] —
    vertices absent from it start from their own id (our
    deterministic restatement of igraph's "negative = unlabeled"
    convention); fixed is DF[id] — those vertices never change label
    (they still VOTE every round). Seeds that are not fixed may be
    overrun by their neighborhood's majority, exactly as in igraph."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (vertices or vertex_universe(edges)).select("id")
    adj = pack_adjacency(
        edges, buckets=b, undirected=True, weight_col=weight_col,
        normalize_weights=False,
    ).persist()
    mgr = CheckpointManager(
        checkpoint_dir, "lpa", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=b,
    )
    start_it = 0
    state = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_it = found[0] + 1
            state = mgr.load(found[0], "id")
    if state is None:
        init = verts.select("id", F.col("id").alias("label"))
        if initial is not None:
            init = (
                verts.join(
                    initial.select("id", F.col("label").alias("_il")), "id", "left"
                )
                .select("id", F.coalesce("_il", F.col("id")).alias("label"))
            )
        # lazy repartition keeps hash(id, b) metadata for superstep 0
        state = init.repartition(b, "id")
    fixed_marker = None
    if fixed is not None:
        fixed_marker = (
            fixed.select("id", F.lit(True).alias("_fixed"))
            .repartition(b, "id")
            .persist()
        )

    iterations = 0
    adj_cols = ["src", "neighbors"] + (["wnorm"] if weight_col else [])
    for it in range(start_it, max_iter):
        # shuffle_hash hints + in-row prev label: same superstep plan
        # discipline as pagerank.py / components.py
        joined = adj.select(*adj_cols).join(
            state.hint("shuffle_hash"), adj["src"] == state["id"], "inner"
        ).select(*(adj_cols[1:] + ["label"]))
        if weight_col is None:
            msgs = scatter(joined, "label", engine=scatter_engine)  # (dst, label)
            self_votes = state.select(F.col("id").alias("dst"), "label")
            votes = (
                msgs.unionAll(self_votes)
                .groupBy("dst", "label")
                .agg(F.count("*").alias("cnt"))
            )
        else:
            z = F.explode(F.arrays_zip("neighbors", "wnorm")).alias("z")
            msgs = joined.select(z, "label").select(
                F.col("z.neighbors").alias("dst"), "label",
                F.col("z.wnorm").alias("w"),
            )
            self_votes = state.select(
                F.col("id").alias("dst"), "label", F.lit(1.0).alias("w")
            )
            votes = (
                msgs.unionAll(self_votes)
                .groupBy("dst", "label")
                .agg(F.sum("w").alias("cnt"))
            )
        # majority pick as one hash agg: max(struct(cnt, -label)) ==
        # "highest count, ties -> minimum label" — replaces a window
        # row_number whose per-dst sort cost a full extra sort+shuffle
        # pass every superstep
        winners = votes.groupBy("dst").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("_nl"))).alias("_m")
        ).select("dst", (-F.col("_m._nl")).alias("new_label"))
        upd = state.join(
            winners.hint("shuffle_hash"), state["id"] == winners["dst"], "left"
        )
        if fixed_marker is not None:
            upd = upd.join(fixed_marker.hint("shuffle_hash"), "id", "left")
            keep = F.coalesce("_fixed", F.lit(False))
            next_label = F.when(keep, F.col("label")).otherwise(
                F.coalesce("new_label", F.col("label"))
            )
        else:
            next_label = F.coalesce("new_label", F.col("label"))
        new_state = upd.select(
            "id", next_label.alias("label"), F.col("label").alias("prev_label")
        )
        new_state, stats_row = mgr.save(
            new_state, it, "id", counters={"iteration": it},
            stats_cols=[
                F.sum((F.col("label") != F.col("prev_label")).cast("long")).alias("c")
            ],
        )
        changed = stats_row["c"] or 0
        state = new_state.select("id", "label")
        iterations = it + 1
        if changed == 0:
            break
    labels = mgr.finalize(state.select("id", "label"))
    adj.unpersist()
    if fixed_marker is not None:
        fixed_marker.unpersist()
    if stats is not None:
        stats["iterations"] = iterations
    if renumber:
        # community key = min member id, then dense 0..k-1
        min_member = labels.groupBy("label").agg(F.min("id").alias("_mm"))
        labels = labels.join(min_member, "label").select(
            "id", F.col("_mm").alias("label")
        )
        return _renumber(labels).withColumnRenamed("component", "community")
    return labels.select("id", F.col("label").alias("community"))
