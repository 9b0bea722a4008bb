"""Leading-eigenvector community detection: recursive spectral
bisection of the modularity matrix.

igraph surface matched: igraph_community_leading_eigenvector
(igraph@0.10.x src/community/leading_eigenvector.c wraps ARPACK
[public anchor; NOT a port — ARPACK's implicitly-restarted Lanczos is
a sequential dense-driver loop]). Model: Newman 2006, "Finding
community structure in networks using the eigenvectors of matrices"
(PRE 74, 036104): split a group g by the sign of the leading
eigenvector of the generalized modularity matrix

    B^(g)_ij = A_ij - k_i k_j / m2 - delta_ij f_i,
    f_i = sum_{j in g} (A_ij - k_i k_j / m2),     m2 = 2m,

commit the split only when its modularity gain

    dQ = s^T B^(g) s / (2 * m2),   s_i = sign(x_i),

is positive, and recurse until no group is divisible.

Distributed formulation
-----------------------
B is never materialized: B^(g) x needs only the within-group edge
list (A x = one join + partial-agg groupBy), the per-group scalar
sum_j k_j x_j (one groupBy), and column math on per-vertex statics
(k, f) — the engine's standard superstep shape, BATCHED over all
active groups at once (state keyed (g, id), every join carries g).
The eigensolver is two-phase deterministic power iteration:

- phase 1 runs on B^(g) unshifted; if the Rayleigh quotient x'Bx of
  the result is positive, the dominant-magnitude eigenvalue is the
  algebraically-largest and x is the answer;
- otherwise (|lambda_min| > lambda_max — typical for subgroups, whose
  spectra are strongly negative) phase 2 reruns with the Gershgorin
  shift sigma_g = max_i(dg_i + k_i K_g/m2 + |k_i^2/m2 + f_i|) + 0.1,
  which makes B^(g) + sigma I positive definite so power iteration
  provably converges to the algebraically-largest eigenvector.

x is L2-normalized and ROUNDED to 12 decimals every iteration (the
walktrap ds discipline): rounding snaps both engines to the same
grid, so the trajectory — and hence the sign split — is bit-identical
against the pure-Python twin, and converged states become EXACT
fixpoints (checked every 10 iterations for early exit). Split
children get ids 2g+1 / 2g+2; groups with dQ <= 0 (rounded) or a
one-sided sign vector finalize. igraph stops the same way; its
ARPACK tolerances can pick a different (non-deterministic) eigenbasis
on near-ties, so parity is pinned against the twin of THIS spec plus
Newman's published karate result (4 communities, Q = 0.3934) —
reproduced exactly by this spec at iters >= 80.

Physical shape (the spectral.py / pagerank.py discipline): the state
DF[g, id, k, fs, xprev, y] carries the per-vertex statics (k and the
SHIFT-FOLDED fs = f - sigma_g, so the shifted rerun is the same
superstep with different statics — no per-iteration sigma join) and
the UNNORMALIZED new vector y; normalization + round folds into the
next iteration's message expression via a broadcast-joined per-group
norm table. gsym is persisted pre-partitioned hash(g, v) for the
level, so each iteration is ONE frontier-sized data exchange (the
message groupBy (g, u)) plus two broadcast exchanges of #groups-row
sub-aggregates, all inside ONE materialization job (eager
localCheckpoint per step — see _power's docstring for why per-step
severance, not persist+truncate); the only driver sync is the
exact-fixpoint probe once per 10 steps.

Scale envelope: per level, per iteration = one frontier-sized
exchange over the ACTIVE groups only; levels are O(log n_communities)
by construction (every level halves or finalizes each group). The
all-group batching means total work per level is one pass over the
edge set regardless of how many groups are active — the same envelope
as one Louvain move round times the iteration count.

No SQL oracle: the eigensolver recursion is not reasonably
CTE-expressible; driver registration is rows-only with pytest gates —
the declared weaker-check category, same as the rest of the community
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.components import _renumber
from graftlink.lineage import cut
from graftlink.louvain import _und_weighted

_cut = lambda df: cut(df, eager=True)

P = 1_000_000_007
A1 = 2_654_435_761 % P
C1 = 824_633_702


def _x0(id_col):
    """Portable deterministic init in [-0.5, 0.5): the engine's
    standard mod-P poly-hash (identical arithmetic in the twin)."""
    h = F.pmod(F.pmod(id_col, F.lit(P)) * F.lit(A1) + F.lit(C1), F.lit(P))
    return h.cast("double") / F.lit(float(P)) - F.lit(0.5)


def _xcol(ndf_alias: str = "_n"):
    """round-12 normalized x from the carried raw y + broadcast norm."""
    return F.round(
        F.when(F.col(ndf_alias) > 0, F.col("y") / F.col(ndf_alias)).otherwise(
            F.col("y")
        ),
        12,
    )


def _norms_of(y: DataFrame) -> DataFrame:
    """Tiny per-group L2-norm table DF[g, _n] of the raw y state."""
    return y.groupBy("g").agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("_n"))


def _group_split(ids, k, ui, vi, w, m2, iters, budget, g0):
    """Local numpy kernel: the full remaining bisection recursion for
    ONE group, on the SAME round-12 grid trajectory as the distributed
    superstep path (same x0 hash, same normalize+round per step, same
    block-of-10 exact-fixpoint probe, same two-phase Gershgorin shift,
    same dQ guard, same 2g+1/2g+2 child path ids) — so hybrid routing
    changes WHERE a group's recursion runs, not WHAT it returns.
    Rounding to the 1e-12 grid snaps both execution engines' float
    summation-order noise to the same values (the walktrap ds
    discipline).

    ids: sorted unique member vertex ids (int64). (ui, vi, w): the
    SYMMETRIC within-group edge list as positions into ids (each
    undirected edge appears in both directions). Returns int64 labels
    aligned with ids (binary-tree path ids, globally unique)."""
    import numpy as np

    n = len(ids)
    labels = np.empty(n, dtype=np.int64)
    stack = [(np.arange(n), int(g0), int(budget))]

    def rnorm(y):
        nn = float(np.sqrt(float((y * y).sum())))
        return np.round(y / nn if nn > 0 else y, 12)

    while stack:
        member, g, bud = stack.pop()
        if len(member) <= 1 or bud <= 0:
            labels[member] = g
            continue
        loc = np.full(n, -1, dtype=np.int64)
        loc[member] = np.arange(len(member))
        em = (loc[ui] >= 0) & (loc[vi] >= 0)
        eu, ev, ew = loc[ui[em]], loc[vi[em]], w[em]
        km = k[member]
        dg = np.zeros(len(member))
        np.add.at(dg, eu, ew)
        Kg = float(km.sum())
        f = dg - km * Kg / m2

        def power(fs):
            idm = ids[member]
            h = ((idm % P) * A1 + C1) % P
            x = rnorm(h.astype(np.float64) / float(P) - 0.5)
            t = 0
            while t < iters:
                block = min(10, iters - t)
                for _ in range(block):
                    prev = x
                    y1 = np.zeros(len(member))
                    np.add.at(y1, eu, ew * x[ev])
                    s = float((km * x).sum())
                    x = rnorm(y1 - km * s / m2 - fs * x)
                t += block
                if float(np.max(np.abs(x - prev))) == 0.0:
                    break
            return x

        x = power(f)
        y1 = np.zeros(len(member))
        np.add.at(y1, eu, ew * x[ev])
        bx = y1 - km * float((km * x).sum()) / m2 - f * x
        if float((x * bx).sum()) <= 0:
            sigma = float(np.max(dg + km * Kg / m2 + np.abs(km * km / m2 + f))) + 0.1
            x = power(f - sigma)
        s = np.where(x >= 0, 1.0, -1.0)
        ta = float((ew * s[eu] * s[ev]).sum())
        ks = float((km * s).sum())
        dq = round((ta - ks * ks / m2 - float(f.sum())) / (2 * m2), 12)
        if dq > 0 and s.min() < s.max():
            stack.append((member[s > 0], 2 * g + 1, bud - 1))
            stack.append((member[s <= 0], 2 * g + 2, bud - 1))
        else:
            labels[member] = g
    return labels


def _local_finish(
    verts: DataFrame, gsym: DataFrame, m2: float, iters: int, budget: int
) -> DataFrame:
    """Finish every routed group's remaining recursion in ONE
    cogrouped applyInPandas job: verts DF[g, id, k] cogrouped with the
    within-group symmetric edges DF[g, u, v, w] on g — each group
    arrives as one Arrow batch and runs _group_split vectorized.
    Input rows are sorted inside the kernel so accumulation order is
    deterministic regardless of shuffle arrival order."""
    import numpy as np
    import pandas as pd

    def fn(key, vdf, edf):
        g0 = int(key[0])
        ids = np.sort(vdf["id"].to_numpy(np.int64))
        k = vdf["k"].to_numpy(np.float64)[np.argsort(vdf["id"].to_numpy(np.int64), kind="stable")]
        if len(edf):
            ui = np.searchsorted(ids, edf["u"].to_numpy(np.int64))
            vi = np.searchsorted(ids, edf["v"].to_numpy(np.int64))
            w = edf["w"].to_numpy(np.float64)
            eo = np.lexsort((vi, ui))
            ui, vi, w = ui[eo], vi[eo], w[eo]
        else:
            ui = np.zeros(0, dtype=np.int64)
            vi = np.zeros(0, dtype=np.int64)
            w = np.zeros(0)
        labels = _group_split(ids, k, ui, vi, w, m2, iters, budget, g0)
        return pd.DataFrame({"id": ids, "g": labels})

    return (
        verts.groupBy("g")
        .cogroup(gsym.groupBy("g"))
        .applyInPandas(fn, schema="id long, g long")
    )


def _bx(gsym: DataFrame, mem: DataFrame, x: DataFrame, m2: float) -> DataFrame:
    """DF[g, id, y] with y = (B^(g) x)_id — the once-per-level form
    used for the Rayleigh-quotient probe (the hot loop is _power)."""
    xv = x.select("g", F.col("id").alias("v"), F.col("x").alias("xv"))
    y1 = (
        gsym.join(xv.hint("shuffle_hash"), ["g", "v"])
        .groupBy("g", F.col("u").alias("id"))
        .agg(F.sum(F.col("w") * F.col("xv")).alias("y1"))
    )
    s = (
        mem.join(x.hint("shuffle_hash"), ["g", "id"])
        .groupBy("g")
        .agg(F.sum(F.col("k") * F.col("x")).alias("s"))
    )
    return (
        mem.join(x.hint("shuffle_hash"), ["g", "id"])
        .join(y1.hint("shuffle_hash"), ["g", "id"], "left")
        .join(s.hint("shuffle_hash"), "g")
        .select(
            "g",
            "id",
            (
                F.coalesce("y1", F.lit(0.0))
                - F.col("k") * F.col("s") / F.lit(m2)
                - F.col("f") * F.col("x")
            ).alias("y"),
        )
    )


def _power(
    gsym: DataFrame,
    mem: DataFrame,
    m2: float,
    iters: int,
) -> DataFrame:
    """Deterministic power iteration on B^(g) + sigma_g I, batched over
    groups. mem is DF[g, id, k, fs] with fs = f - sigma_g (sigma
    pre-folded; 0 for the unshifted phase). Returns x DF[g, id, x]
    (normalized, rounded — the trajectory of the module docstring).

    One eager localCheckpoint per step (the state is referenced by
    FOUR subplans — norms, s, messages, diagonal carry — so persist +
    truncate-every-4 would grow the logical plan 4^4x between
    truncations and melt AQE's plan rendering; per-step severance
    keeps every plan a constant ~7-stage job). The per-group scalars
    (L2 norm of the previous raw y, s = sum k x) ride as
    broadcast-joined sub-aggregates of the checkpointed leaf —
    #groups-row broadcasts, no driver round-trip in the hot loop; the
    only collect is the exact-fixpoint probe once per 10 steps."""
    state = _cut(
        mem.select(
            "g", "id", "k", "fs", F.lit(0.0).alias("xprev"),
            _x0(F.col("id")).alias("y"),
        )
    )
    norms = _norms_of(state)

    t = 0
    while t < iters:
        block = min(10, iters - t)
        for _ in range(block):
            # x_t folds round(y/n, 12) into every consumer expression.
            xdf = state.join(F.broadcast(norms), "g").select(
                "g", "id", "k", "fs", _xcol().alias("x")
            )
            s = xdf.groupBy("g").agg(F.sum(F.col("k") * F.col("x")).alias("s"))
            xv = xdf.select("g", F.col("id").alias("v"), F.col("x").alias("xv"))
            y1 = (
                gsym.join(xv.hint("shuffle_hash"), ["g", "v"])
                .groupBy("g", F.col("u").alias("id"))
                .agg(F.sum(F.col("w") * F.col("xv")).alias("y1"))
            )
            new = (
                xdf.join(y1.hint("shuffle_hash"), ["g", "id"], "left")
                .join(F.broadcast(s), "g")
                .select(
                    "g",
                    "id",
                    "k",
                    "fs",
                    F.col("x").alias("xprev"),
                    (
                        F.coalesce("y1", F.lit(0.0))
                        - F.col("k") * F.col("s") / F.lit(m2)
                        - F.col("fs") * F.col("x")
                    ).alias("y"),
                )
            )
            state = _cut(new)
            norms = _norms_of(state)
        t += block
        # rounded states make convergence an EXACT fixpoint: probe the
        # last step only (if it was the identity, all later steps are).
        delta = (
            state.join(F.broadcast(norms), "g")
            .agg(F.max(F.abs(_xcol() - F.col("xprev"))).alias("d"))
            .collect()[0]["d"]
        )
        if delta == 0.0:
            break
    return _cut(
        state.join(F.broadcast(norms), "g").select("g", "id", _xcol().alias("x"))
    )


def _union_all(dfs):
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    return out


def leading_eigenvector_communities(
    edges: DataFrame,
    iters: int = 100,
    max_levels: int = 12,
    renumber: bool = True,
    weights: str | None = None,
    local_threshold: int = 100_000,
    local_edge_threshold: int = 4_000_000,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    fingerprint: str = "",
) -> DataFrame:
    """edges DF[src,dst] -> DF[id, community]: deterministic
    distributed Newman leading-eigenvector bisection (two-phase
    shifted power iteration, dQ-guarded recursive splits). Community
    ids are renumbered to min-member-id dense labels by default (same
    contract as louvain_communities). `weights` names an explicit
    edge-weight column (igraph
    ``community_leading_eigenvector(weights=)``); default is
    parallel-edge multiplicity.

    Hybrid execution: a group whose member count exceeds
    `local_threshold` (or whose within-group edge count exceeds
    `local_edge_threshold` — a dense 100k-vertex group can carry 1e10
    edges) is split by the distributed superstep eigensolver; once a
    group fits both bounds, its ENTIRE remaining recursion finishes
    inside one cogrouped applyInPandas numpy kernel on the same
    round-12 trajectory (see _group_split), one Arrow batch per group,
    all groups in one job. At web scale the top split(s) of the giant
    component run distributed and the geometric tail is embarrassingly
    parallel; `local_threshold=0` forces the pure-distributed path
    (exercised by the parity pytest against the hybrid default).

    With `checkpoint_dir`, the (active assignment, finalized labels)
    pair lands durably after every completed LEVEL (bisections halve
    or finalize every group, so level granularity bounds re-work at
    <= one level); resume=True restarts from the last completed level
    — the trajectory is deterministic, so resumed == uninterrupted
    exactly. m2/sym are invariant and recomputed from the input."""
    spark = edges.sparkSession
    b = int(spark.conf.get("spark.sql.shuffle.partitions"))
    durable = checkpoint_dir is not None
    from graftlink.checkpoint import CheckpointManager

    mgr_a = CheckpointManager(
        checkpoint_dir, "leigen-asg", spark, input_fingerprint=fingerprint
    )
    mgr_f = CheckpointManager(
        checkpoint_dir, "leigen-finals", spark, input_fingerprint=fingerprint
    )
    wedges = _und_weighted(edges, weights).localCheckpoint(eager=True)
    m2 = (wedges.agg(F.sum(F.col("w") * 2)).collect()[0][0]) or 1.0
    sym = wedges.select(F.col("a").alias("u"), F.col("b").alias("v"), "w").unionAll(
        wedges.select(F.col("b").alias("u"), F.col("a").alias("v"), "w")
    ).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("k"))

    start_lvl = 0
    asg = None
    finals: list[DataFrame] = []
    if resume and durable:
        fa, ff = mgr_a.latest(), mgr_f.latest()
        if fa is not None and ff is not None:
            l0 = min(fa[0], ff[0])
            asg = mgr_a.load(l0, "id").localCheckpoint(eager=True)
            finals = [mgr_f.load(l0, "id").localCheckpoint(eager=True)]
            start_lvl = l0 + 1
    if asg is None:
        asg = _cut(deg.select("id", F.lit(0).cast("long").alias("g"), "k"))

    for lvl in range(start_lvl, max_levels):
        sizes = asg.groupBy("g").agg(F.count("*").alias("n"))
        singles = asg.join(sizes.where(F.col("n") <= 1), "g", "left_semi")
        if not singles.isEmpty():
            finals.append(_cut(singles.select("id", "g")))
            asg = _cut(asg.join(sizes.where(F.col("n") > 1), "g", "left_semi"))
        if asg.isEmpty():
            break

        au = asg.select(F.col("id").alias("u"), "g")
        av = asg.select(F.col("id").alias("v"), F.col("g").alias("gv"))
        # persisted pre-partitioned on (g, v): the hot-loop message join
        # reuses this exchange every iteration of the level.
        gsym = (
            sym.join(au.hint("shuffle_hash"), "u")
            .join(av.hint("shuffle_hash"), "v")
            .where(F.col("g") == F.col("gv"))
            .select("g", "u", "v", "w")
            .repartition(b, "g", "v")
            .persist()
        )
        gsym.count()

        if local_threshold > 0:
            ecnt = gsym.groupBy("g").agg((F.count("*") / 2).alias("_me"))
            small = (
                sizes.where((F.col("n") > 1) & (F.col("n") <= local_threshold))
                .join(ecnt, "g", "left")
                .where(
                    F.coalesce("_me", F.lit(0.0))
                    <= F.lit(float(local_edge_threshold))
                )
                .select("g")
            )
            if not small.isEmpty():
                # sever lineage: both cogroup sides descend from the
                # same asg/gsym plans, which trips Spark's ambiguous
                # self-join analysis inside flatMapCoGroupsInPandas.
                sverts = _cut(asg.join(F.broadcast(small), "g", "left_semi"))
                sgsym = _cut(gsym.join(F.broadcast(small), "g", "left_semi"))
                finals.append(
                    _cut(
                        _local_finish(
                            sverts.select("g", "id", "k"),
                            sgsym,
                            m2,
                            iters,
                            max_levels - lvl,
                        )
                    )
                )
                asg = _cut(asg.join(F.broadcast(small), "g", "left_anti"))
                if asg.isEmpty():
                    gsym.unpersist()
                    break
                gbig = (
                    gsym.join(F.broadcast(small), "g", "left_anti")
                    .repartition(b, "g", "v")
                    .persist()
                )
                gbig.count()
                gsym.unpersist()
                gsym = gbig

        dg = gsym.groupBy("g", F.col("u").alias("id")).agg(F.sum("w").alias("dg"))
        Kg = asg.groupBy("g").agg(F.sum("k").alias("Kg"))
        mem = _cut(
            asg.join(dg.hint("shuffle_hash"), ["g", "id"], "left")
            .join(F.broadcast(Kg), "g")
            .select(
                "g",
                "id",
                "k",
                F.coalesce("dg", F.lit(0.0)).alias("dg"),
                "Kg",
                (
                    F.coalesce("dg", F.lit(0.0))
                    - F.col("k") * F.col("Kg") / F.lit(m2)
                ).alias("f"),
            )
        )

        x = _power(
            gsym, mem.select("g", "id", "k", F.col("f").alias("fs")), m2, iters
        )
        rho = _cut(
            _bx(gsym, mem, x, m2)
            .join(x.hint("shuffle_hash"), ["g", "id"])
            .groupBy("g")
            .agg(F.sum(F.col("x") * F.col("y")).alias("rho"))
        )
        neg = rho.where(F.col("rho") <= 0).select("g")
        if not neg.isEmpty():
            gersh = _cut(
                mem.join(neg.hint("shuffle_hash"), "g", "left_semi")
                .groupBy("g")
                .agg(
                    (
                        F.max(
                            F.col("dg")
                            + F.col("k") * F.col("Kg") / F.lit(m2)
                            + F.abs(
                                F.col("k") * F.col("k") / F.lit(m2) + F.col("f")
                            )
                        )
                        + F.lit(0.1)
                    ).alias("sigma")
                )
            )
            mem2 = (
                mem.join(neg.hint("shuffle_hash"), "g", "left_semi")
                .join(F.broadcast(gersh), "g")
                .select("g", "id", "k", (F.col("f") - F.col("sigma")).alias("fs"))
            )
            gsym2 = (
                gsym.join(F.broadcast(neg), "g", "left_semi")
                .repartition(b, "g", "v")
                .persist()
            )
            gsym2.count()
            x2 = _power(gsym2, mem2, m2, iters)
            x = _cut(
                x.join(neg.hint("shuffle_hash"), "g", "left_anti").unionAll(x2)
            )
            gsym2.unpersist()

        sx = x.select("g", "id", F.when(F.col("x") >= 0, 1.0).otherwise(-1.0).alias("s"))
        su = sx.select("g", F.col("id").alias("u"), F.col("s").alias("su"))
        sv = sx.select("g", F.col("id").alias("v"), F.col("s").alias("sv"))
        termA = (
            gsym.join(su.hint("shuffle_hash"), ["g", "u"])
            .join(sv.hint("shuffle_hash"), ["g", "v"])
            .groupBy("g")
            .agg(F.sum(F.col("w") * F.col("su") * F.col("sv")).alias("ta"))
        )
        termBC = (
            mem.join(sx.hint("shuffle_hash"), ["g", "id"])
            .groupBy("g")
            .agg(
                F.sum(F.col("k") * F.col("s")).alias("ks"),
                F.sum("f").alias("tf"),
                F.min("s").alias("smin"),
                F.max("s").alias("smax"),
            )
        )
        verdict = _cut(
            mem.select("g")
            .distinct()
            .join(termA.hint("shuffle_hash"), "g", "left")
            .join(termBC.hint("shuffle_hash"), "g")
            .select(
                "g",
                (
                    (
                        F.round(
                            (
                                F.coalesce("ta", F.lit(0.0))
                                - F.col("ks") * F.col("ks") / F.lit(m2)
                                - F.col("tf")
                            )
                            / F.lit(2 * m2),
                            12,
                        )
                        > 0
                    )
                    & (F.col("smin") < F.col("smax"))
                ).alias("split"),
            )
        )

        done = asg.join(verdict.where(~F.col("split")), "g", "left_semi")
        if not done.isEmpty():
            finals.append(_cut(done.select("id", "g")))
        splitters = verdict.where(F.col("split")).select("g")
        asg = _cut(
            asg.join(splitters.hint("shuffle_hash"), "g", "left_semi")
            .join(sx.hint("shuffle_hash"), ["g", "id"])
            .select(
                "id",
                F.when(F.col("s") > 0, 2 * F.col("g") + 1)
                .otherwise(2 * F.col("g") + 2)
                .alias("g"),
                "k",
            )
        )
        gsym.unpersist()
        if durable:
            funion = (
                _union_all(finals)
                if finals
                else spark.createDataFrame([], "id long, g long")
            )
            asg = mgr_a.save(asg, lvl, "id", counters={"level": lvl})
            finals = [mgr_f.save(funion, lvl, "id", counters={"level": lvl})]
        if asg.isEmpty():
            break
    if not asg.isEmpty():
        finals.append(_cut(asg.select("id", "g")))
    if not finals:
        empty = edges.sparkSession.createDataFrame([], "id long, community long")
        return empty

    labels = _union_all(finals).select("id", F.col("g").alias("label"))
    mmb = labels.groupBy("label").agg(F.min("id").alias("_mm"))
    labels = labels.join(mmb, "label").select("id", F.col("_mm").alias("label"))
    if renumber:
        return _renumber(labels).withColumnRenamed("component", "community")
    return labels.select("id", F.col("label").alias("community"))
