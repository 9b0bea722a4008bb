"""Louvain-style modularity community detection (round-1 VERDICT
stretch #10).

igraph surface matched: igraph_community_multilevel (igraph@0.10.x
src/community/louvain.c, Blondel et al. 2008). The sequential
algorithm's vertex-by-vertex moves don't distribute, so this is the
standard synchronous/parallel variant (Que et al. 2015 "Scalable
Community Detection with the Louvain Algorithm"; Sotera DGA's
distributed Louvain has the same shape), made DETERMINISTIC:

- move phase: every vertex evaluates its neighbor communities'
  modularity gain  dQ(c) = k_{i,c} - gamma * k_i * Sigma_tot^{-i}(c)
  / (2m)  from the same snapshot; best community = max gain, ties ->
  min community id; a move is ACCEPTED only if the vertex's
  improvement is the strict lexicographic (gain, -id) maximum among
  itself and all would-moving neighbors (Grappolo-style local-maxima
  acceptance). Accepted movers form an independent set, so each round
  strictly increases modularity — synchronous-swap oscillation is
  impossible, with no RNG anywhere.
- coarsen phase: contract communities to super-vertices (edge weights
  aggregate, intra-community weight becomes a self-loop), then repeat
  the move phase one level up. Levels are few (web graphs: 3-5);
  every phase is built-in joins/aggs over (id, community) state.

Determinism: integer ids, same-snapshot synchronous evaluation and
id-tie-broken local-maxima acceptance -> identical output at any
partitioning (pytest gate).
Quality gate: modularity(louvain) >= modularity(LPA) on the standard
fixtures, and exact two-clique recovery.

No SQL oracle: the gain argmax + acceptance + coarsening recursion is
far outside a readable recursive CTE; driver registration is
rows-only with the pytest gates above (the declared weaker-check
category).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.components import _renumber


def _und_weighted(edges: DataFrame, weights: str | None = None) -> DataFrame:
    """DF[a, b, w] — undirected simple weighted edges (parallel edges
    accumulate weight; direction dropped; self-loops dropped).

    `weights` names an explicit edge-weight column (igraph's
    ``community_multilevel(weights=)`` contract); when None, weight is
    parallel-edge multiplicity."""
    wexpr = (
        F.sum(F.col(weights)).cast("double")
        if weights is not None
        else F.count("*").cast("double")
    )
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            *([F.col(weights)] if weights is not None else []),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(wexpr.alias("w"))
    )


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    gamma: float = 1.0,
    weights: str | None = None,
) -> float:
    """Newman modularity of a community assignment DF[id, community]
    over the undirected simple view of `edges` (weighted when
    `weights` names an edge-weight column)."""
    und = _und_weighted(edges, weights)
    m2 = und.agg(F.sum(F.col("w") * 2)).collect()[0][0] or 1.0
    ca = communities.select(F.col("id").alias("a"), F.col("community").alias("cca"))
    cb = communities.select(F.col("id").alias("b"), F.col("community").alias("ccb"))
    internal = (
        und.join(ca, "a").join(cb, "b")
        .where(F.col("cca") == F.col("ccb"))
        .agg(F.sum(F.col("w") * 2))
        .collect()[0][0]
        or 0.0
    )
    deg = (
        und.select(F.col("a").alias("id"), "w")
        .unionAll(und.select(F.col("b").alias("id"), "w"))
        .groupBy("id")
        .agg(F.sum("w").alias("k"))
    )
    tot = (
        deg.join(communities, "id")
        .groupBy("community")
        .agg(F.sum("k").alias("kt"))
        .agg(F.sum(F.col("kt") * F.col("kt")))
        .collect()[0][0]
        or 0.0
    )
    return internal / m2 - gamma * tot / (m2 * m2)


def _sym_deg(wedges: DataFrame):
    """(sym, deg): symmetrized no-self-loop edge view DF[u, v, w] and
    full weighted degree DF[id, k] (self-loops count twice, standard
    convention). Both checkpointed."""
    sym = wedges.where(F.col("a") != F.col("b")).select(
        F.col("a").alias("u"), F.col("b").alias("v"), "w"
    ).unionAll(
        wedges.where(F.col("a") != F.col("b")).select(
            F.col("b").alias("u"), F.col("a").alias("v"), "w"
        )
    ).localCheckpoint(eager=True)
    selfw = wedges.where(F.col("a") == F.col("b")).select(
        F.col("a").alias("id"), (F.col("w") * 2).alias("sw")
    )
    deg = (
        sym.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("k"))
        .join(selfw, "id", "outer")
        .select(
            "id",
            (F.coalesce("k", F.lit(0.0)) + F.coalesce("sw", F.lit(0.0))).alias("k"),
        )
        .localCheckpoint(eager=True)
    )
    return sym, deg


def _move_phase(
    wedges: DataFrame,
    gamma: float,
    max_rounds: int,
    m2: float,
    init: DataFrame | None = None,
    state_broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """One Louvain level over weighted edges DF[a, b, w] (self-loops
    allowed = coarsened internal weight). Returns DF[id, c].

    `init` (DF[id, c], optional) seeds the partition instead of
    singletons — Leiden's aggregate level starts from the previous
    level's move-phase partition expressed on the refined
    super-vertices, so communities keep merging across levels.

    Per round: ONE materialization job (persist + changed-count agg
    via CheckpointManager.save, the engine-standard superstep
    discipline) — the gain plan is never executed twice."""
    from graftlink.checkpoint import CheckpointManager
    sym, deg = _sym_deg(wedges)
    # hybrid state attach (the infomap/leading_eigenvector recipe):
    # broadcast the n-sized state frames while they fit, shuffle_hash
    # hints past the threshold — the sort-free plan at 100x without
    # giving up the broadcast joins at bench scale. Both arms produce
    # identical results; the plan gate pins the shuffle arm.
    if deg.count() <= state_broadcast_threshold:
        att = F.broadcast
    else:
        att = lambda df: df.hint("shuffle_hash")  # noqa: E731
    if init is None:
        comm = deg.select("id", F.col("id").alias("c"))
    else:
        comm = deg.join(init, "id", "left").select(
            "id", F.coalesce("c", F.col("id")).alias("c")
        )
    comm = comm.localCheckpoint(eager=True)
    mgr = CheckpointManager(
        None, "louvain", wedges.sparkSession, mode="local", truncate_every=1
    )

    for rnd in range(max_rounds):
        # every per-round join attaches via att(): broadcast or
        # shuffle_hash, never an unhinted SortMergeJoin that re-sorts
        # the m-sized sym table every move round (the b74526f defect).
        ctot = (
            comm.join(att(deg), "id")
            .groupBy("c").agg(F.sum("k").alias("ktot"))
        )
        # weight from i to each neighbor community
        kic = (
            sym.join(
                att(
                    comm.withColumnRenamed("id", "v")
                    .withColumnRenamed("c", "nc")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("id"), "nc")
            .agg(F.sum("w").alias("kin"))
        )
        cur = comm.join(att(deg), "id")
        # candidates: neighbor communities + staying put. The n-sized
        # cur attaches INTO the m-sized kic (inner join — a vertex
        # with no intra-community neighbor edges still gets its stay
        # row from the union branch, and the groupBy max dedups), so
        # the broadcast arm never shuffles kic.
        cand = (
            kic.join(att(cur), "id")
            .select(
                "id", "c", "k",
                F.coalesce("nc", F.col("c")).alias("nc"),
                F.coalesce("kin", F.lit(0.0)).alias("kin"),
            )
            .unionByName(
                cur.select(
                    "id", "c", "k", F.col("c").alias("nc"), F.lit(0.0).alias("kin")
                )
            )
            .groupBy("id", "c", "k", "nc")
            .agg(F.max("kin").alias("kin"))
        )
        scored = cand.join(
            att(ctot.withColumnRenamed("c", "nc")), "nc"
        ).select(
            "id", "c", "nc",
            (
                F.col("kin")
                - F.lit(gamma)
                * F.col("k")
                * (F.col("ktot") - F.when(F.col("nc") == F.col("c"), F.col("k")).otherwise(F.lit(0.0)))
                / F.lit(m2)
            ).alias("gain"),
        )
        best = (
            scored.groupBy("id", "c")
            .agg(F.max(F.struct(F.col("gain"), (-F.col("nc")).alias("_nn"))).alias("_m"))
            .select(
                "id", "c",
                (-F.col("_m._nn")).alias("best_c"),
                F.col("_m.gain").alias("best_gain"),
            )
        )
        cur_gain = scored.where(F.col("nc") == F.col("c")).select(
            "id", F.col("gain").alias("stay_gain")
        )
        # local-maxima acceptance (Grappolo-style "best in
        # neighborhood moves"): a vertex moves only if its improvement
        # is lexicographically ((gain, -id)) the strict maximum among
        # itself and every would-moving neighbor. Accepted movers form
        # an independent set, so each round is a strict modularity
        # ascent — no swap/chase oscillation, no RNG, deterministic.
        # (The round-1 draft gated moves by (id+round) parity instead;
        # that oscillates on hub graphs — karate cycled at Q=0.28.)
        movers = (
            best.join(att(cur_gain), "id")
            .where(F.col("best_gain") > F.col("stay_gain") + F.lit(1e-12))
            .select(
                "id", "best_c",
                (F.col("best_gain") - F.col("stay_gain")).alias("mgain"),
            )
        )
        nbr_best = (
            sym.select("u", "v")
            .join(
                att(movers.select(
                    F.col("id").alias("v"),
                    F.struct(F.col("mgain"), (-F.col("id")).alias("_ni")).alias("_ns"),
                )),
                "v",
            )
            .groupBy(F.col("u").alias("id"))
            .agg(F.max("_ns").alias("_nb"))
        )
        accepted = (
            movers.join(att(nbr_best), "id", "left")
            .where(
                F.col("_nb").isNull()
                | (F.struct(F.col("mgain"), (-F.col("id")).alias("_ni")) > F.col("_nb"))
            )
            .select("id", "best_c")
        )
        moved = comm.join(att(accepted), "id", "left").select(
            "id", F.coalesce("best_c", F.col("c")).alias("new_c"), F.col("c")
        )
        new_comm, row = mgr.save(
            moved.select("id", F.col("new_c").alias("c"), F.col("c").alias("prev")),
            rnd, "id", counters={"round": rnd},
            stats_cols=[
                F.sum((F.col("c") != F.col("prev")).cast("long")).alias("changed")
            ],
        )
        comm = new_comm.select("id", "c")
        if not row["changed"]:
            # the globally-best mover is always accepted (no neighbor
            # outranks it), so zero accepted moves <=> zero movers
            # <=> single-move fixpoint
            break
    comm = mgr.finalize(comm)
    return comm


def _refine_phase(
    wedges: DataFrame, P: DataFrame, gamma: float, max_rounds: int, m2: float,
    state_broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """Leiden refinement (Traag/Waltman/van Eck 2019 §'refinement
    phase', igraph_community_leiden — igraph@0.10.x
    src/community/leiden.c [public anchor; NOT a port — the sequential
    queue there doesn't distribute]): rebuild every move-phase
    community of `P` (DF[id, c]) from singletons by merging ONLY along
    intra-community edges. Deterministic distributed variant of the
    paper's randomized merge:

    - only vertices still SINGLETON in the refined partition may move
      (communities only grow -> termination), to the max-gain
      (ties -> min id) neighbor refined community inside their own
      P-community, and only with positive internal weight kin > 0;
    - Grappolo-style local-maxima acceptance among adjacent movers
      (same rule as the move phase) -> no two adjacent vertices move
      in the same round, no RNG, partitioning-independent.

    Every accepted merge follows an edge with kin > 0 into the target,
    so each refined community is internally CONNECTED — the Leiden
    guarantee plain Louvain lacks. Returns DF[id, c] refining P."""
    from graftlink.checkpoint import CheckpointManager

    sym, deg = _sym_deg(wedges)
    if deg.count() <= state_broadcast_threshold:
        att = F.broadcast
    else:
        att = lambda df: df.hint("shuffle_hash")  # noqa: E731
    pc_u = P.select(F.col("id").alias("u"), F.col("c").alias("_pu"))
    pc_v = P.select(F.col("id").alias("v"), F.col("c").alias("_pv"))
    sym_c = (
        sym.join(att(pc_u), "u")
        .join(att(pc_v), "v")
        .where(F.col("_pu") == F.col("_pv"))
        .select("u", "v", "w")
        .localCheckpoint(eager=True)
    )
    comm = deg.select("id", F.col("id").alias("c")).localCheckpoint(eager=True)
    mgr = CheckpointManager(
        None, "leiden-refine", wedges.sparkSession, mode="local", truncate_every=1
    )
    for rnd in range(max_rounds):
        # same per-round shuffle_hash discipline as _move_phase
        ctot = (
            comm.join(att(deg), "id")
            .groupBy("c").agg(F.sum("k").alias("ktot"))
        )
        singles = (
            comm.groupBy("c").agg(F.count("*").alias("_n"), F.min("id").alias("id"))
            .where(F.col("_n") == 1)
            .select("id")
        )
        kic = (
            sym_c.join(
                att(
                    comm.withColumnRenamed("id", "v")
                    .withColumnRenamed("c", "nc")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("id"), "nc")
            .agg(F.sum("w").alias("kin"))
        )
        movers = (
            kic.join(att(singles), "id", "left_semi")
            .join(att(comm), "id")
            .join(att(deg), "id")
            .where(F.col("nc") != F.col("c"))
            .join(att(ctot.withColumnRenamed("c", "nc")), "nc")
            .select(
                "id", "nc",
                (
                    F.col("kin")
                    - F.lit(gamma) * F.col("k") * F.col("ktot") / F.lit(m2)
                ).alias("gain"),
            )
            .where(F.col("gain") > F.lit(1e-12))
            .groupBy("id")
            .agg(F.max(F.struct(F.col("gain"), (-F.col("nc")).alias("_nn"))).alias("_m"))
            .select(
                "id",
                (-F.col("_m._nn")).alias("best_c"),
                F.col("_m.gain").alias("mgain"),
            )
        )
        nbr_best = (
            sym_c.select("u", "v")
            .join(
                att(movers.select(
                    F.col("id").alias("v"),
                    F.struct(F.col("mgain"), (-F.col("id")).alias("_ni")).alias("_ns"),
                )),
                "v",
            )
            .groupBy(F.col("u").alias("id"))
            .agg(F.max("_ns").alias("_nb"))
        )
        accepted = (
            movers.join(att(nbr_best), "id", "left")
            .where(
                F.col("_nb").isNull()
                | (F.struct(F.col("mgain"), (-F.col("id")).alias("_ni")) > F.col("_nb"))
            )
            .select("id", "best_c")
        )
        moved = comm.join(att(accepted), "id", "left").select(
            "id", F.coalesce("best_c", F.col("c")).alias("c"), F.col("c").alias("prev")
        )
        new_comm, row = mgr.save(
            moved, rnd, "id", counters={"round": rnd},
            stats_cols=[
                F.sum((F.col("c") != F.col("prev")).cast("long")).alias("changed")
            ],
        )
        comm = new_comm.select("id", "c")
        if not row["changed"]:
            break
    return mgr.finalize(comm)


def leiden_communities(
    edges: DataFrame,
    gamma: float = 1.0,
    levels: int = 5,
    max_rounds: int = 20,
    renumber: bool = True,
    weights: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    fingerprint: str = "",
    state_broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """edges DF[src,dst] -> DF[id, community] via deterministic
    distributed Leiden: Louvain move phase + singleton-merge
    refinement, coarsening on the REFINED partition while seeding the
    next move phase with the coarse partition (the paper's structure).
    Returned communities are the move-phase partition (composed down
    to original vertices); the refinement only controls aggregation,
    which is what guarantees internally-connected communities.

    `weights` names an explicit edge-weight column (igraph
    ``community_leiden(weights=)``); default is multiplicity.
    `checkpoint_dir`/`resume`/`fingerprint`: durable per-LEVEL
    checkpointing of the four level-state frames (mapping, flat
    result, coarse edges, next-level seed), same contract as
    louvain_communities."""
    spark = edges.sparkSession
    durable = checkpoint_dir is not None
    from graftlink.checkpoint import CheckpointManager

    mgrs = {
        name: CheckpointManager(
            checkpoint_dir, f"leiden-{name}", spark, input_fingerprint=fingerprint
        )
        for name in ("mapping", "flat", "wedges", "init")
    }
    start_lvl = 0
    mapping = None  # original id -> current-level vertex
    flat = None     # original id -> move-phase community (the result)
    init = None     # current-level seed partition (previous P)
    wedges = None
    if resume and durable:
        latests = {name: m.latest() for name, m in mgrs.items()}
        if all(v is not None for v in latests.values()):
            lvl0 = min(v[0] for v in latests.values())
            mapping = mgrs["mapping"].load(lvl0, "id").localCheckpoint(eager=True)
            flat = mgrs["flat"].load(lvl0, "id").localCheckpoint(eager=True)
            wedges = mgrs["wedges"].load(lvl0, "a").localCheckpoint(eager=True)
            init = mgrs["init"].load(lvl0, "id").localCheckpoint(eager=True)
            start_lvl = lvl0 + 1
    if wedges is None:
        wedges = _und_weighted(edges, weights).localCheckpoint(eager=True)
    m2 = wedges.agg(F.sum(F.col("w") * 2)).collect()[0][0] or 1.0

    for lvl in range(start_lvl, levels):
        P = _move_phase(
            wedges, gamma, max_rounds, m2, init=init,
            state_broadcast_threshold=state_broadcast_threshold,
        )
        R = _refine_phase(
            wedges, P, gamma, max_rounds, m2,
            state_broadcast_threshold=state_broadcast_threshold,
        )
        if mapping is None:
            flat = P.select("id", F.col("c").alias("label"))
            mapping = R.select("id", F.col("c").alias("sv"))
        else:
            flat = mapping.join(
                P.withColumnRenamed("id", "sv").hint("shuffle_hash"), "sv"
            ).select(
                "id", F.col("c").alias("label")
            )
            mapping = mapping.join(
                R.withColumnRenamed("id", "sv").hint("shuffle_hash"), "sv"
            ).select(
                "id", F.col("c").alias("sv")
            )
        flat = flat.localCheckpoint(eager=True)
        mapping = mapping.localCheckpoint(eager=True)
        n_vert = R.count()
        n_ref = R.select("c").distinct().count()
        if n_ref == n_vert:
            break
        ca = R.withColumnRenamed("id", "a").withColumnRenamed("c", "sa")
        cb = R.withColumnRenamed("id", "b").withColumnRenamed("c", "sb")
        wedges = (
            wedges.join(ca.hint("shuffle_hash"), "a")
            .join(cb.hint("shuffle_hash"), "b")
            .select(
                F.least("sa", "sb").alias("a"),
                F.greatest("sa", "sb").alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        # seed the next level with the move-phase partition expressed
        # on the refined super-vertices (each refined community lies
        # inside exactly one P community)
        init = (
            R.join(P.withColumnRenamed("c", "_pc").hint("shuffle_hash"), "id")
            .select(F.col("c").alias("id"), F.col("_pc").alias("c"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if durable:
            mapping = mgrs["mapping"].save(mapping, lvl, "id", counters={"level": lvl})
            flat = mgrs["flat"].save(flat, lvl, "id", counters={"level": lvl})
            wedges = mgrs["wedges"].save(wedges, lvl, "a", counters={"level": lvl})
            init = mgrs["init"].save(init, lvl, "id", counters={"level": lvl})
    labels = flat
    if renumber:
        mm = labels.groupBy("label").agg(F.min("id").alias("_mm"))
        labels = labels.join(mm.hint("shuffle_hash"), "label").select(
            "id", F.col("_mm").alias("label")
        )
        return _renumber(labels).withColumnRenamed("component", "community")
    return labels.select("id", F.col("label").alias("community"))


def louvain_communities(
    edges: DataFrame,
    gamma: float = 1.0,
    levels: int = 3,
    max_rounds: int = 20,
    renumber: bool = True,
    weights: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    fingerprint: str = "",
    state_broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """edges DF[src,dst] -> DF[id, community] via deterministic
    parallel Louvain with coarsening. `weights` names an explicit
    edge-weight column (igraph ``community_multilevel(weights=)``);
    default is parallel-edge multiplicity.

    With `checkpoint_dir`, the (id->super-vertex mapping, coarsened
    edge table) pair lands durably after every completed LEVEL —
    coarsening shrinks levels geometrically, so level granularity
    bounds re-work after a kill at <= one level while writing
    O(current graph) state, and m2 (total weight x2, incl. the
    self-loops coarsening creates) is invariant under coarsening so
    it is recomputed from the resumed table. resume=True restarts
    from the last completed level. Include the weight column in the
    caller's fingerprint when weights= varies over the same edges."""
    spark = edges.sparkSession
    durable = checkpoint_dir is not None
    from graftlink.checkpoint import CheckpointManager

    mgr_m = CheckpointManager(
        checkpoint_dir, "louvain-mapping", spark, input_fingerprint=fingerprint
    )
    mgr_w = CheckpointManager(
        checkpoint_dir, "louvain-wedges", spark, input_fingerprint=fingerprint
    )
    start_lvl = 0
    mapping = None  # original id -> current super-vertex
    wedges = None
    if resume and durable:
        fm, fw = mgr_m.latest(), mgr_w.latest()
        if fm is not None and fw is not None:
            lvl0 = min(fm[0], fw[0])
            mapping = mgr_m.load(lvl0, "id").localCheckpoint(eager=True)
            wedges = mgr_w.load(lvl0, "a").localCheckpoint(eager=True)
            start_lvl = lvl0 + 1
    if wedges is None:
        wedges = _und_weighted(edges, weights).localCheckpoint(eager=True)
    m2 = wedges.agg(F.sum(F.col("w") * 2)).collect()[0][0] or 1.0

    for lvl in range(start_lvl, levels):
        comm = _move_phase(
            wedges, gamma, max_rounds, m2,
            state_broadcast_threshold=state_broadcast_threshold,
        )
        n_comm = comm.select("c").distinct().count()
        n_vert = comm.count()
        if mapping is None:
            mapping = comm.select("id", F.col("c").alias("sv"))
        else:
            mapping = (
                mapping.join(
                    comm.withColumnRenamed("id", "sv").hint("shuffle_hash"), "sv"
                )
                .select("id", F.col("c").alias("sv"))
            )
        mapping = mapping.localCheckpoint(eager=True)
        if n_comm == n_vert:
            break
        # coarsen: communities become vertices, weights aggregate,
        # internal weight becomes self-loops
        ca = comm.withColumnRenamed("id", "a").withColumnRenamed("c", "sa")
        cb = comm.withColumnRenamed("id", "b").withColumnRenamed("c", "sb")
        wedges = (
            wedges.join(ca.hint("shuffle_hash"), "a")
            .join(cb.hint("shuffle_hash"), "b")
            .select(
                F.least("sa", "sb").alias("a"),
                F.greatest("sa", "sb").alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        if durable:
            mapping = mgr_m.save(mapping, lvl, "id", counters={"level": lvl})
            wedges = mgr_w.save(wedges, lvl, "a", counters={"level": lvl})
    labels = mapping.select("id", F.col("sv").alias("label"))
    if renumber:
        mm = labels.groupBy("label").agg(F.min("id").alias("_mm"))
        labels = labels.join(mm.hint("shuffle_hash"), "label").select(
            "id", F.col("_mm").alias("label")
        )
        return _renumber(labels).withColumnRenamed("component", "community")
    return labels.select("id", F.col("label").alias("community"))
