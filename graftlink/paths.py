"""Shortest-path family — frontier supersteps over the edge table.

igraph surface matched: `igraph_distances` / python `Graph.distances`
(igraph@0.10.x src/paths/unweighted.c, dijkstra.c [unverified files])
restricted to single/multi-source (the all-pairs form is BSP-hostile
at web scale; SURVEY.md §2A), plus `igraph_closeness` and a
k-source-batched `igraph_betweenness` estimate (Brandes 2001; the
sampled variant is Brandes-Pich 2007).

Shapes:
- `bfs_distances`     — one source, packed-adjacency scatter loop.
- `multi_source_bfs`  — k sources batched in ONE loop: state is keyed
                        (source, id), so k BFS waves share every
                        superstep's join/shuffle instead of running k
                        sequential jobs. Levels = max eccentricity.
- `sssp_weighted`     — Bellman-Ford with a delta frontier: only
                        vertices whose distance improved relax their
                        out-edges next round; positive weights
                        converge in <= longest-shortest-path-hops
                        rounds.
- `closeness_from_sources` — (reached-1)/sum(dist) per source over
                        the multi-source BFS (igraph closeness for
                        the sampled sources, out-direction).
- `betweenness_from_sources` — Brandes forward sigma pass + backward
                        dependency accumulation, batched by source;
                        sources=all vertices gives exact betweenness
                        (pytest gate), a k-sample gives the standard
                        estimator at k/n of the cost.

All but betweenness have bounded-round recursive-CTE DuckDB twins
(iterative_sql.py); betweenness has one too (per-source unrolled
level recursion) — the delta update is computed as
sigma_v * sum((1+delta_w)/sigma_w) in BOTH engines so the fp
association matches.
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
            .join(visited.select("id").hint("shuffle_hash"), "id", "left_anti")
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


def pseudo_diameter(
    edges: DataFrame,
    start: int = 0,
    directed: bool = False,
    buckets: int | None = None,
) -> DataFrame:
    """One-row DF[far_id, diameter_lb] — double-sweep BFS (Magnien/
    Latapy/Habib): BFS from `start`, take the farthest vertex (ties ->
    min id), BFS again from it; the second eccentricity is a lower
    bound on the diameter (exact on trees, near-exact on web graphs —
    igraph_diameter's exact all-pairs form is BSP-hostile at scale).
    Both sweeps reuse the frontier superstep; deterministic."""
    d1 = bfs_distances(edges, start, directed=directed, buckets=buckets)
    far = d1.orderBy(F.col("dist").desc(), F.col("id").asc()).limit(1).collect()[0]
    d2 = bfs_distances(edges, int(far["id"]), directed=directed, buckets=buckets)
    return d2.agg(
        F.lit(int(far["id"])).alias("far_id"),
        F.max("dist").cast("int").alias("diameter_lb"),
    )


def multi_source_bfs(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 100,
    directed: bool = True,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
) -> DataFrame:
    """DF[source, id, dist] — hop distances from every source in ONE
    superstep loop (k waves share each round's join + shuffle).
    With `checkpoint_dir`, every depth's visited set is durably
    checkpointed with lineage (north-rule resume contract); pass
    resume=True + the same input fingerprint to continue a killed
    run from its last completed depth."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # packed adjacency, like bfs_distances: the cached hash(src, B)
    # blocks + shuffle_hash hint keep the big side exchange- AND
    # sort-free every depth (r3 — the previous localCheckpoint'ed
    # long-form edge table lost its partitioning metadata, so every
    # depth re-exchanged and SMJ-sorted all m edge rows)
    adj = pack_adjacency(e.distinct(), buckets=b).persist()
    mgr = CheckpointManager(
        checkpoint_dir, "msbfs", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=b,
    )

    start_depth = 1
    visited = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_depth = found[0] + 1
            visited = mgr.load(found[0], "id")
    if visited is None:
        visited = spark.createDataFrame(
            [(s, s, 0) for s in sources], "source long, id long, dist int"
        ).repartition(b, "id")
    frontier = visited.where(F.col("dist") == start_depth - 1)
    for depth in range(start_depth, max_depth + 1):
        nxt = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"], "inner")
            .select("source", F.explode("neighbors").alias("id"))
            .distinct()
            .join(
                visited.select("source", "id").hint("shuffle_hash"),
                ["source", "id"],
                "left_anti",
            )
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
    result = mgr.finalize(visited.select("source", "id", "dist"))
    adj.unpersist()
    return result


def sssp_weighted(
    edges: DataFrame,
    source: int,
    weight_col: str = "weight",
    max_iter: int = 200,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
    allow_negative: bool = False,
) -> DataFrame:
    """DF[id, dist double] — single-source shortest paths with
    non-negative edge weights (Bellman-Ford supersteps, delta
    frontier). Unreachable vertices are absent. With
    `checkpoint_dir`, per-iteration durable state (the saved frame
    carries `_old`, so the delta frontier is reconstructible);
    resume=True continues a killed run.

    allow_negative=True accepts negative edge weights (igraph
    `distances(weights=)` runs Bellman-Ford for these): the delta
    frontier relaxation is already Bellman-Ford-correct for negatives
    (dist only decreases; an improved vertex re-enters the frontier),
    so the only changes are the round bound — |V| supersteps replaces
    max_iter, since round r has settled every shortest path of <= r
    hops and a simple path has at most |V|-1 — and negative-cycle
    detection: improvements still occurring at round |V| are only
    possible on a negative cycle reachable from the source, which
    raises ValueError (igraph errors on negative loops the same
    way)."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # persist WITH hash(src, B) partitioning metadata (localCheckpoint
    # drops it) so the per-round relax join never re-exchanges or
    # sorts the edge table — only the delta frontier moves
    e = edges.select(
        "src", "dst", F.col(weight_col).cast("double").alias("_w")
    ).repartition(b, "src").persist()
    mgr = CheckpointManager(
        checkpoint_dir, "sssp", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=b,
    )

    start_it = 0
    state = frontier = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_it = found[0] + 1
            merged = mgr.load(found[0], "id")
            frontier = merged.where(
                F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
            ).select("id", "dist")
            state = merged.select("id", "dist")
    if state is None:
        state = spark.createDataFrame(
            [(source, 0.0)], "id long, dist double"
        ).repartition(b, "id")
        frontier = state
    if allow_negative:
        # Bellman-Ford round bound: any negative-cycle-free shortest
        # path has <= |V|-1 hops; a round-|V| improvement proves a
        # reachable negative cycle. Replaces max_iter (documented).
        from graftlink.vertices import vertex_universe

        max_iter = vertex_universe(edges).count() + 1
    improved = 0
    for it in range(start_it, max_iter):
        relax = (
            e.join(frontier.hint("shuffle_hash"), e["src"] == frontier["id"], "inner")
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("_w")).alias("nd"))
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            state.withColumnRenamed("dist", "_old")
            .join(relax.hint("shuffle_hash"), "id", "full_outer")
            .select(
                "id",
                F.least(
                    F.coalesce("_old", F.lit(float("inf"))),
                    F.coalesce("nd", F.lit(float("inf"))),
                ).alias("dist"),
                F.col("_old"),
            )
        )
        merged, row = mgr.save(
            merged, it, "id", counters={"iteration": it},
            stats_cols=[
                F.sum(
                    (F.col("_old").isNull() | (F.col("dist") < F.col("_old"))).cast(
                        "long"
                    )
                ).alias("improved")
            ],
        )
        frontier = merged.where(
            F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
        ).select("id", "dist")
        state = merged.select("id", "dist")
        improved = row["improved"]
        if not improved:
            break
    if allow_negative and improved:
        e.unpersist()
        mgr.release()
        raise ValueError(
            "sssp_weighted(allow_negative=True): negative cycle "
            "reachable from the source (distances still improving "
            "after |V| Bellman-Ford rounds)"
        )
    result = mgr.finalize(state)
    e.unpersist()
    return result


def widest_path_widths(
    edges: DataFrame,
    source: int,
    weight_col: str = "weight",
    max_iter: int = 200,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, width double] — maximin bottleneck capacity from
    `source`: width(v) = max over source->v paths of the minimum edge
    weight along the path, width(source) = +Infinity (igraph
    get_widest_paths / widest_path_widths convention,
    igraph@0.10.x src/paths/widest.c [public anchor]). Unreachable
    vertices are absent.

    The exact sssp_weighted superstep with (min, +) swapped for
    (max, min): relax = max over incoming frontier edges of
    least(width(u), w(u, v)); a vertex re-enters the delta frontier
    only when its width strictly increases. Monotone non-decreasing
    widths drawn from the finite edge-weight set converge in at most
    |V|-1 rounds (no cycle can raise a width), so the delta frontier
    empties without a special bound. Same physical shape: edge table
    persisted hash(src, B), only the frontier moves, one
    materialization job per round via CheckpointManager stats."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(
        "src", "dst", F.col(weight_col).cast("double").alias("_w")
    ).repartition(b, "src").persist()
    mgr = CheckpointManager(None, "widest", spark, mode="local", buckets=b)

    state = spark.createDataFrame(
        [(source, float("inf"))], "id long, width double"
    ).repartition(b, "id")
    frontier = state
    for it in range(max_iter):
        relax = (
            e.join(frontier.hint("shuffle_hash"), e["src"] == frontier["id"], "inner")
            .select(
                F.col("dst").alias("id"),
                F.least(F.col("width"), F.col("_w")).alias("nw"),
            )
            .groupBy("id")
            .agg(F.max("nw").alias("nw"))
        )
        merged = (
            state.withColumnRenamed("width", "_old")
            .join(relax.hint("shuffle_hash"), "id", "full_outer")
            .select(
                "id",
                F.greatest(
                    F.coalesce("_old", F.lit(float("-inf"))),
                    F.coalesce("nw", F.lit(float("-inf"))),
                ).alias("width"),
                F.col("_old"),
            )
        )
        merged, row = mgr.save(
            merged, it, "id", counters={"iteration": it},
            stats_cols=[
                F.sum(
                    (F.col("_old").isNull() | (F.col("width") > F.col("_old"))).cast(
                        "long"
                    )
                ).alias("improved")
            ],
        )
        frontier = merged.where(
            F.col("_old").isNull() | (F.col("width") > F.col("_old"))
        ).select("id", "width")
        state = merged.select("id", "width")
        if not row["improved"]:
            break
    result = mgr.finalize(state)
    e.unpersist()
    return result


def _parent_join(
    e: DataFrame, d: DataFrame, step_cost, by_source: bool = False
) -> DataFrame:
    """Min-parent tree edges over converged distances: parent(v) =
    min{u : (u,v) in E and dist(u) + cost(u,v) == dist(v)} — a pure
    post-pass on the distance table, so the choice is a deterministic
    function of (graph, source), independent of superstep order, and
    SQL-expressible WITHOUT recursion. The fp equality in the weighted
    case is exact: dist(v) is a min over exactly these dist(u)+w
    doubles, so it is bitwise equal to at least one of them (and the
    DuckDB twin performs the same additions).

    Returns d extended with a `parent` column (NULL at sources /
    unreachable rows)."""
    if by_source:
        ds = d.select(
            F.col("source").alias("_s1"),
            F.col("id").alias("_u"),
            F.col("dist").alias("_ds"),
        )
        dd = d.select(
            F.col("source").alias("_s2"),
            F.col("id").alias("_v"),
            F.col("dist").alias("_dd"),
        )
        parents = (
            e.join(ds, e["src"] == ds["_u"])
            .join(dd, (ds["_s1"] == dd["_s2"]) & (e["dst"] == dd["_v"]))
            .where((F.col("_ds") + step_cost) == F.col("_dd"))
            .groupBy(F.col("_s1").alias("source"), F.col("_v").alias("id"))
            .agg(F.min("src").alias("parent"))
        )
        keys = ["source", "id"]
    else:
        ds = d.select(F.col("id").alias("_u"), F.col("dist").alias("_ds"))
        dd = d.select(F.col("id").alias("_v"), F.col("dist").alias("_dd"))
        parents = (
            e.join(ds, e["src"] == ds["_u"])
            .join(dd, e["dst"] == dd["_v"])
            .where((F.col("_ds") + step_cost) == F.col("_dd"))
            .groupBy(F.col("_v").alias("id"))
            .agg(F.min("src").alias("parent"))
        )
        keys = ["id"]
    return d.join(parents, on=keys, how="left").select(*keys, "dist", "parent")


def bfs_parents(
    edges: DataFrame,
    source: int,
    max_depth: int = 100,
    directed: bool = True,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, dist, parent] — BFS distances plus the min-predecessor
    shortest-path-tree parent (NULL at the source). igraph surface:
    the `parents` output of igraph_bfs / get_shortest_paths
    (igraph@0.10.x src/paths/unweighted.c [unverified split])."""
    d = bfs_distances(edges, source, max_depth, directed, buckets)
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return _parent_join(e.distinct(), d, F.lit(1))


def multi_source_parents(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 100,
    directed: bool = True,
    buckets: int | None = None,
) -> DataFrame:
    """DF[source, id, dist, parent] — batched BFS trees: the same
    min-predecessor post-pass per source over ONE multi-source BFS."""
    d = multi_source_bfs(edges, sources, max_depth, directed, buckets)
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return _parent_join(e.distinct(), d, F.lit(1), by_source=True)


def sssp_parents(
    edges: DataFrame,
    source: int,
    weight_col: str = "weight",
    max_iter: int = 200,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, dist, parent] — weighted SSSP distances plus the
    min-predecessor shortest-path-tree parent (see _parent_join for
    why the fp equality is exact)."""
    d = sssp_weighted(edges, source, weight_col, max_iter, buckets)
    e = edges.select(
        "src", "dst", F.col(weight_col).cast("double").alias("_w")
    )
    return _parent_join(e, d, F.col("_w"))


def shortest_path(
    edges: DataFrame,
    source: int,
    target: int,
    directed: bool = True,
    weighted: bool = False,
    weight_col: str = "weight",
    max_depth: int = 100,
    buckets: int | None = None,
) -> DataFrame:
    """DF[step, id, dist] — ONE concrete shortest source->target path
    (igraph get_shortest_paths for a single pair), reconstructed by
    walking the min-parent tree back from `target`: dist(target)
    frontier-of-one lookups on the persisted parent table (each a
    1-row driver sync — the path itself is inherently sequential
    O(path-length) output, not a distributed result). Empty when
    `target` is unreachable. step = 0 (source) .. hops (target);
    dist is hops for BFS, cumulative weight for weighted=True."""
    spark = edges.sparkSession
    if weighted:
        pts = sssp_parents(edges, source, weight_col, max_depth, buckets)
    else:
        pts = bfs_parents(edges, source, max_depth, directed, buckets)
    pts = pts.persist()
    schema = f"step int, id long, dist {'double' if weighted else 'int'}"
    try:
        cur = pts.where(F.col("id") == target).collect()
        if not cur:
            return spark.createDataFrame([], schema)
        rev = []  # (id, dist) target -> source
        node = cur[0]
        while True:
            rev.append((node["id"], node["dist"]))
            if node["parent"] is None:
                break
            node = pts.where(F.col("id") == node["parent"]).collect()[0]
        rows = [
            (step, vid, dist)
            for step, (vid, dist) in enumerate(reversed(rev))
        ]
        return spark.createDataFrame(rows, schema)
    finally:
        pts.unpersist()


def _mode_edges(edges: DataFrame, mode: str) -> tuple[DataFrame, bool]:
    """igraph mode= handling: OUT follows edges, IN reverses them,
    ALL ignores direction. Returns (edge view, directed flag)."""
    if mode == "out":
        return edges, True
    if mode == "in":
        return (
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            True,
        )
    if mode == "all":
        return edges, False
    raise ValueError(f"mode must be 'out'|'in'|'all', got {mode!r}")


def closeness_from_sources(
    edges: DataFrame,
    sources: list[int],
    directed: bool = True,
    mode: str = "out",
    normalized: bool = True,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, closeness] for each source, unreachable vertices
    excluded (igraph_closeness semantics). normalized=True (default,
    igraph's default) is (reached-1)/sum(dist) — the inverse average
    distance; normalized=False is igraph's raw 1/sum(dist).
    mode follows igraph's IGRAPH_OUT / IGRAPH_IN / IGRAPH_ALL
    (directed=False forces ALL). A k-sample of sources is the
    standard estimator at k/n of the all-pairs cost."""
    if not directed:
        mode = "all"
    e, dirflag = _mode_edges(edges, mode)
    d = multi_source_bfs(e, sources, directed=dirflag, buckets=buckets)
    num = (F.col("_r") - 1) if normalized else F.lit(1.0)
    return (
        d.groupBy(F.col("source").alias("id"))
        .agg(F.count("*").alias("_r"), F.sum("dist").alias("_s"))
        .select(
            "id",
            F.round(
                F.when(F.col("_s") > 0, num / F.col("_s")).otherwise(F.lit(0.0)),
                6,
            ).alias("closeness"),
        )
    )


def eccentricity_harmonic_from_sources(
    edges: DataFrame,
    sources: list[int],
    directed: bool = True,
    mode: str = "out",
    normalized: bool = False,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, eccentricity, harmonic] per source — igraph_eccentricity
    and igraph_harmonic_centrality (sum of 1/d over reachable t != s;
    normalized=True divides by n-1, igraph's normalized form) for the
    sampled sources, from ONE batched BFS. mode follows igraph's
    IGRAPH_OUT / IGRAPH_IN / IGRAPH_ALL (directed=False forces ALL)."""
    from graftlink.vertices import vertex_universe

    if not directed:
        mode = "all"
    e, dirflag = _mode_edges(edges, mode)
    d = multi_source_bfs(e, sources, directed=dirflag, buckets=buckets)
    h = F.sum(F.when(F.col("dist") > 0, F.lit(1.0) / F.col("dist")))
    if normalized:
        n = vertex_universe(edges).count()
        h = h / F.lit(max(n - 1, 1))
    return (
        d.groupBy(F.col("source").alias("id"))
        .agg(
            F.max("dist").cast("int").alias("eccentricity"),
            F.round(h, 6).alias("harmonic"),
        )
    )


def betweenness_from_sources(
    edges: DataFrame,
    sources: list[int],
    vertices: DataFrame | None = None,
    directed: bool = True,
    max_depth: int = 100,
    rescale: bool = False,
    normalized: bool = False,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    fingerprint: str = "",
) -> DataFrame:
    """DF[id, betweenness] — Brandes dependency accumulation over the
    shortest-path DAGs of the given sources (exact betweenness when
    sources = all vertices; an unbiased k-sample estimator otherwise).

    rescale=True multiplies by n/k — the Brandes-Pich 2007 estimator
    scaling, so a k-source sample estimates the full-graph value.
    normalized=True divides by (n-1)(n-2) — igraph's directed
    normalization; with this engine's symmetrized undirected
    accumulation (each unordered pair counted in both directions) the
    same divisor reproduces igraph/networkx undirected normalized
    values too.

    Batched: ALL sources run in one forward loop (state keyed
    (source, id)) and one backward loop over levels, so the superstep
    count is 2 * max-eccentricity regardless of |sources|.

    With `checkpoint_dir`, BOTH loops durably checkpoint per level:
    the forward `visited` frame each depth, and each backward level's
    delta frame (Brandes' backward pass needs EVERY level's deltas at
    the end, so resume reloads all landed levels, not just the
    latest). resume=True restarts a killed run at the last completed
    superstep. The fingerprint should also encode the SOURCE SET when
    callers vary it (the same edge table with different sources is
    different state)."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    durable = checkpoint_dir is not None
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # two persisted co-partitioned views of the distinct edge set: the
    # forward pass joins on src every level, the backward pass on dst
    # — with hash(key, B) metadata kept by persist(), neither loop
    # re-exchanges or sorts the m-sized side per level (r3; the
    # localCheckpoint'ed frame forced an SMJ of all edges per level)
    e = e.distinct().repartition(b, "src").persist()
    e_by_dst = e.repartition(b, "dst").persist()
    mgr = CheckpointManager(
        checkpoint_dir, "btw-fwd", spark,
        input_fingerprint=fingerprint, buckets=b,
    )
    mgr_b = CheckpointManager(
        checkpoint_dir, "btw-bwd", spark,
        input_fingerprint=fingerprint, buckets=b,
    ) if durable else None

    # ---- forward: (source, id, dist, sigma) level-synchronous ----
    visited = None
    start_depth = 1
    maxlvl = 0
    fwd_done = False
    bwd_levels: list[int] = mgr_b.iterations() if (resume and durable) else []
    if resume and durable:
        fv = mgr.latest()
        if fv is not None:
            k = fv[0]
            visited = mgr.load(k, "id").localCheckpoint(eager=True)
            maxlvl = visited.agg(F.max("dist")).collect()[0][0] or 0
            # depth k added nothing => the kill happened at/after the
            # convergence check; the forward pass is complete. maxlvl
            # (deepest reached level) is recomputed from the state, so
            # no counter round-trip is needed.
            fwd_done = maxlvl < k or bool(bwd_levels)
            start_depth = k + 1
    if visited is None:
        visited = spark.createDataFrame(
            [(s, s, 0, 1.0) for s in sources],
            "source long, id long, dist int, sigma double",
        ).repartition(b, "id")
        bwd_levels = []
    if not fwd_done:
        frontier = visited.where(F.col("dist") == maxlvl) if maxlvl else visited
        converged = False
        for depth in range(start_depth, max_depth + 1):
            nxt = (
                e.join(frontier.hint("shuffle_hash"), e["src"] == frontier["id"], "inner")
                .groupBy("source", F.col("dst").alias("id"))
                .agg(F.sum("sigma").alias("sigma"))
                .join(
                    visited.select("source", "id").hint("shuffle_hash"),
                    ["source", "id"],
                    "left_anti",
                )
                .select("source", "id", F.lit(depth).cast("int").alias("dist"), "sigma")
            )
            visited, row = mgr.save(
                visited.unionByName(nxt), depth, "id", counters={"depth": depth},
                stats_cols=[
                    F.sum((F.col("dist") == depth).cast("long")).alias("new_count")
                ],
            )
            if not row["new_count"]:
                converged = True
                break
            maxlvl = depth
            frontier = visited.where(F.col("dist") == depth)
        if not converged:
            # Truncation must surface (same policy as scc.py's
            # max_outer raise): running Brandes' backward pass over a
            # depth-truncated DAG silently under-counts dependencies,
            # and in durable mode it would land backward frames that a
            # later resume would mistake for a completed forward pass.
            raise RuntimeError(
                f"betweenness forward BFS still growing at max_depth="
                f"{max_depth}; raise max_depth (graph eccentricity "
                f"exceeds it)"
            )
    visited = mgr.finalize(visited)

    # ---- backward: delta by descending level ----
    # delta_v = sigma_v * sum_succ (1 + delta_w) / sigma_w — SAME fp
    # association as the SQL twin
    # per-level delta frames accumulate in a Python list and union
    # LAZILY at the end — checkpointing the growing union every level
    # was O(levels) full rewrites (round-2 VERDICT wrong #4); only the
    # per-level `acc` (next level's join input) needs materializing.
    # Durable mode instead lands each level's frame as its own
    # iteration (iteration number = level), so the lazy union reads
    # shallow parquet-backed frames and resume reloads them all.
    if bwd_levels:
        delta_parts = [mgr_b.load(l, "id") for l in sorted(bwd_levels, reverse=True)]
        acc = delta_parts[-1]
        start_lvl = min(bwd_levels) - 1
    else:
        acc = visited.where(F.col("dist") == maxlvl).select(
            "source", "id", "sigma", F.lit(0.0).alias("delta")
        )
        if durable:
            acc = mgr_b.save(acc, maxlvl, "id", counters={"lvl": maxlvl})
        delta_parts = [acc]
        start_lvl = maxlvl - 1
    for lvl in range(start_lvl, 0, -1):
        level_rows = visited.where(F.col("dist") == lvl)
        contrib = (
            e_by_dst.join(
                acc.select(
                    "source", F.col("id").alias("dst"),
                    ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("_t"),
                ).hint("shuffle_hash"),
                "dst",
            )
            .groupBy("source", F.col("src").alias("id"))
            .agg(F.sum("_t").alias("_acc"))
        )
        acc = (
            level_rows.join(contrib.hint("shuffle_hash"), ["source", "id"], "left")
            .select(
                "source", "id", "sigma",
                (F.col("sigma") * F.coalesce("_acc", F.lit(0.0))).alias("delta"),
            )
        )
        if durable:
            acc = mgr_b.save(acc, lvl, "id", counters={"lvl": lvl})
        else:
            acc = acc.localCheckpoint(eager=True)
        delta_parts.append(acc)

    deltas = delta_parts[0]
    for part in delta_parts[1:]:
        deltas = deltas.unionByName(part)
    verts = (vertices or vertex_universe(edges)).select("id")
    factor = 1.0
    if rescale or normalized:
        n = verts.count()
        if rescale and sources:
            factor *= n / len(sources)
        if normalized and n > 2:
            factor /= (n - 1) * (n - 2)
    bc = deltas.where(F.col("id") != F.col("source")).groupBy("id").agg(
        F.sum("delta").alias("_bc")
    )
    out = verts.join(bc, "id", "left").select(
        "id",
        F.round(F.coalesce("_bc", F.lit(0.0)) * F.lit(factor), 6).alias(
            "betweenness"
        ),
    ).localCheckpoint(eager=True)
    e.unpersist()
    e_by_dst.unpersist()
    return out


def edge_betweenness_from_sources(
    edges: DataFrame,
    sources: list[int],
    directed: bool = True,
    max_depth: int = 100,
    rescale: bool = False,
    buckets: int | None = None,
) -> DataFrame:
    """DF[src, dst, betweenness] — Brandes edge-dependency
    accumulation over the shortest-path DAGs of the given sources
    (igraph `edge_betweenness`; exact when sources = all vertices,
    the Brandes-Pich k-sample estimator otherwise, rescale=True
    multiplying by n/k).

    The per-source contribution of DAG edge (v, w) — an edge with
    dist(w) = dist(v) + 1 — is sigma_v * (1 + delta_w) / sigma_w
    (Brandes 2001 §4): each edge lies on exactly ONE level of a
    source's DAG, so its per-source term is a single product, summed
    across sources per edge. Both engines compute it as
    sigma_v * ((1 + delta_w) / sigma_w) — same fp association as the
    vertex twin. Directed semantics (igraph's default); undirected
    callers symmetrize and merge orientations themselves.

    Forward pass = betweenness_from_sources' (non-durable); the
    backward loop derives BOTH the vertex deltas (to keep recursing)
    and the per-level edge terms from one shared (source, v, w) DAG
    join per level. Per-level edge frames accumulate in a lazy union
    (the delta_parts discipline). Edges never on any source's DAG
    report 0.0 via the left join with the input edge set.
    """
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e0 = edges.select("src", "dst")
    if not directed:
        e0 = e0.unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e0.distinct().repartition(b, "src").persist()
    e_by_dst = e.repartition(b, "dst").persist()
    mgr = CheckpointManager(None, "ebtw-fwd", spark, mode="local", buckets=b)

    # ---- forward: identical superstep to betweenness_from_sources ----
    visited = spark.createDataFrame(
        [(s, s, 0, 1.0) for s in sources],
        "source long, id long, dist int, sigma double",
    ).repartition(b, "id")
    frontier = visited
    maxlvl = 0
    converged = False
    for depth in range(1, max_depth + 1):
        nxt = (
            e.join(frontier.hint("shuffle_hash"), e["src"] == frontier["id"], "inner")
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(
                visited.select("source", "id").hint("shuffle_hash"),
                ["source", "id"],
                "left_anti",
            )
            .select("source", "id", F.lit(depth).cast("int").alias("dist"), "sigma")
        )
        visited, row = mgr.save(
            visited.unionByName(nxt), depth, "id", counters={"depth": depth},
            stats_cols=[
                F.sum((F.col("dist") == depth).cast("long")).alias("new_count")
            ],
        )
        if not row["new_count"]:
            converged = True
            break
        maxlvl = depth
        frontier = visited.where(F.col("dist") == depth)
    if not converged:
        raise RuntimeError(
            f"edge_betweenness forward BFS still growing at max_depth="
            f"{max_depth}; raise max_depth"
        )

    # ---- backward: vertex deltas recurse, edge terms accumulate ----
    acc = visited.where(F.col("dist") == maxlvl).select(
        "source", "id", "sigma", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=True)
    edge_parts = []
    for lvl in range(maxlvl - 1, -1, -1):
        level_rows = visited.where(F.col("dist") == lvl)
        # (source, v=src, w=dst, _t=(1+delta_w)/sigma_w) for DAG edges
        # whose head sits on the just-processed level
        dag = e_by_dst.join(
            acc.select(
                "source", F.col("id").alias("dst"),
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("_t"),
            ).hint("shuffle_hash"),
            "dst",
        )
        # edge term needs sigma_v of the TAIL, which lives on `lvl`
        per_edge = (
            dag.join(
                level_rows.select(
                    "source", F.col("id").alias("src"), F.col("sigma").alias("_sv")
                ).hint("shuffle_hash"),
                ["source", "src"],
            )
            .select("src", "dst", (F.col("_sv") * F.col("_t")).alias("_c"))
            .localCheckpoint(eager=False)
        )
        edge_parts.append(per_edge)
        contrib = dag.groupBy("source", F.col("src").alias("id")).agg(
            F.sum("_t").alias("_acc")
        )
        acc = (
            level_rows.join(contrib.hint("shuffle_hash"), ["source", "id"], "left")
            .select(
                "source", "id", "sigma",
                (F.col("sigma") * F.coalesce("_acc", F.lit(0.0))).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )

    factor = 1.0
    if rescale and sources:
        from graftlink.vertices import vertex_universe

        factor = vertex_universe(edges).count() / len(sources)
    if edge_parts:
        terms = edge_parts[0]
        for part in edge_parts[1:]:
            terms = terms.unionByName(part)
        eb = terms.groupBy("src", "dst").agg(F.sum("_c").alias("_eb"))
    else:
        eb = spark.createDataFrame([], "src long, dst long, _eb double")
    out = (
        e.join(eb.hint("shuffle_hash"), ["src", "dst"], "left")
        .select(
            "src", "dst",
            F.round(F.coalesce("_eb", F.lit(0.0)) * F.lit(factor), 6).alias(
                "betweenness"
            ),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    e_by_dst.unpersist()
    return out


def subcomponent(
    edges: DataFrame,
    v: int,
    mode: str = "all",
    max_depth: int = 100,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id] — igraph `subcomponent(v, mode)`: the vertices reachable
    FROM v (mode='out'), reaching v (mode='in'), or v's weakly
    connected component (mode='all'); v itself included. One BFS over
    the mode view — the visited set IS the answer."""
    e, dirflag = _mode_edges(edges, mode)
    return bfs_distances(
        e, v, max_depth=max_depth, directed=dirflag, buckets=buckets
    ).select("id")


def shortest_paths_to(
    edges: DataFrame,
    source: int,
    targets: list[int],
    directed: bool = True,
    weighted: bool = False,
    weight_col: str = "weight",
    max_depth: int = 100,
    buckets: int | None = None,
) -> DataFrame:
    """DF[target, step, id, dist] — one concrete shortest path from
    `source` to EACH reachable target (igraph get_shortest_paths
    `to=` form), reconstructed DISTRIBUTEDLY: all k walk-backs run in
    the same superstep loop (frontier = one (target, cur) row per
    unfinished target, joined against the persisted parent table), so
    the loop length is max over targets of dist(target), not the sum
    — the batched analogue of shortest_path()'s driver walk, with no
    per-hop driver round-trip except the loop-exit count.

    Paths are the min-parent tree's, so (source, targets) uniquely
    determines the output (deterministic, SQL-replayable). Unreachable
    targets are absent. step = 0 (source) .. dist (target)."""
    spark = edges.sparkSession
    if weighted:
        pts = sssp_parents(edges, source, weight_col, max_depth, buckets)
    else:
        pts = bfs_parents(edges, source, max_depth, directed, buckets)
    pts = pts.persist()
    try:
        tgt = spark.createDataFrame(
            [(int(t),) for t in targets], "target long"
        )
        cur = (
            pts.join(tgt.hint("shuffle_hash"), pts["id"] == tgt["target"])
            .select("target", "id", "dist", "parent")
            .localCheckpoint(eager=True)
        )
        # rows: finished path cells; frontier: rows whose parent is
        # still to be walked
        parts = [cur.select("target", "id", "dist")]
        frontier = cur.where(F.col("parent").isNotNull()).select(
            "target", F.col("parent").alias("id")
        )
        for _ in range(max_depth + 1):
            step = (
                pts.join(frontier.hint("shuffle_hash"), "id")
                .select("target", "id", "dist", "parent")
                .localCheckpoint(eager=True)
            )
            if step.isEmpty():
                break
            parts.append(step.select("target", "id", "dist"))
            frontier = step.where(F.col("parent").isNotNull()).select(
                "target", F.col("parent").alias("id")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # step index = dist rank along the path; for BFS step == dist,
        # for weighted paths rank by cumulative dist (strictly
        # increasing along a positive-weight path)
        tgt_d = cur.select("target", F.col("dist").alias("_td"))
        ranked = (
            out.join(tgt_d.hint("shuffle_hash"), "target")
            .groupBy("target", "_td")
            .agg(F.sort_array(F.collect_list(F.struct("dist", "id"))).alias("_p"))
            .select(
                "target",
                F.posexplode("_p").alias("step", "_c"),
            )
            .select(
                "target", F.col("step").cast("int").alias("step"),
                F.col("_c.id").alias("id"), F.col("_c.dist").alias("dist"),
            )
        )
        return ranked.localCheckpoint(eager=True)
    finally:
        pts.unpersist()
