"""HyperBall — approximate neighborhood function, effective diameter
and harmonic centrality via iterated HyperLogLog counter merging
(Boldi & Vigna, "In-Core Computation of Geometric Centralities with
HyperBall", 2013; Palmer-Gibbons-Faloutsos ANF, KDD 2002; Flajolet et
al. HyperLogLog, 2007).

This is the engine's flagship *web-scale* distance surface: the exact
path family (`paths.py`, `cycles.py`, `metrics.neighborhood_size`)
materializes balls or per-source frontiers, whose output mass explodes
on small-world graphs (every ball is the whole graph by radius ~6 at
Common-Crawl scale). HyperBall replaces the ball *set* with a fixed
m-register HLL sketch per vertex, so the whole algorithm is

    c_{t+1}(v) = elementwise-max( c_t(v), c_t(w) for each v->w )

— state is |V| x m bytes TOTAL regardless of graph diameter or ball
mass, every superstep is one scatter + one register-max reduce, and
t supersteps yield, for every vertex simultaneously:

  - |B(v, t)| estimates (ball sizes / `neighborhood_size` at any r),
  - the neighborhood function NF(t) = sum_v |B(v, t)| and from it the
    distance distribution and the q-effective diameter,
  - harmonic centrality  H(v) = sum_t (|B_in(v,t)| - |B_in(v,t-1)|)/t
    for EVERY vertex — the igraph `harmonic_centrality` surface that
    `metrics.harmonic_all` answers exactly in O(n*m) work, here at
    O(iter * m_registers) per vertex.

Cross-engine determinism (the house twin discipline): registers are
derived from the engine's portable poly-hash (same constants as
`walks.py` / `sampling.py`), folds over the register array are
left-to-right in both engines (Spark `aggregate` / DuckDB
`list_reduce`), 2^-r comes from a shared literal table of exact
doubles (never `pow`), and NF sums per-vertex estimates as
DECIMAL(28,6) so the global sum is exact and order-independent. The
DuckDB twin replays the identical registers, so even this *sketch*
algorithm is hash-green, not rows-only.

Scale shape: the superstep joins the packed adjacency
(`adjacency.pack_adjacency`, hub-salted CSR blocks) with the sketch
state co-partitioned on hash(id, B); the register-max reduce is a
single exchange on dst. Two reduce engines:

  - engine="jvm": posexplode registers -> partial max agg on
    (dst, j) -> array rebuild. Whole-stage codegen, skew-immune
    (max has map-side combine), but materializes m rows per message.
  - engine="arrow": one repartition(dst) then a mapInArrow segment
    kernel (argsort + np.maximum.reduceat + dict accumulate) that
    finishes the merge inside the partition — the vectorized
    gather-scatter shape the design contract prescribes for
    per-vertex math that outgrows built-in expressions. Memory is
    (#distinct dst per partition) x m bytes.

Both engines produce identical integer registers (tested).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager
from graftlink.vertices import vertex_universe

P = 1_000_000_007
A1, A2, A3, C = 2_654_435_761 % P, 40_503, 69_069, 12_345
W_BITS = 30  # h2 < P < 2^30: rho is leading zeros of a 30-bit window

# exact doubles 2^-r for r in [0, 63]; shared literal table in both
# engines so no libm pow() is ever consulted
_INV_POW2 = [2.0 ** -k for k in range(64)]


def _alpha_mm(m: int) -> float:
    """HLL bias constant alpha_m * m^2 (Flajolet et al. 2007 fig. 3)."""
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    return alpha * m * m


def _register_cols(v, m: int):
    """(j, rho) register derivation from the portable poly-hash.

    h1 = ((v mod P)*A1 + C) mod P          -> bucket j = h1 pmod m
    h2 = ((v mod P)*A3 + h1*A2 + C) mod P  -> rho = 31 - bitlen(h2)

    bitlen is a comparison ladder (sum of [w >= 2^k]), never
    floor(log2(w)) — float log at exact powers of two is not
    portable across libm implementations. All products stay < 2^63.
    """
    vp = F.pmod(v.cast("long"), F.lit(P))
    h1 = F.pmod(vp * F.lit(A1) + F.lit(C), F.lit(P))
    h2 = F.pmod(vp * F.lit(A3) + h1 * F.lit(A2) + F.lit(C), F.lit(P))
    j = F.pmod(h1, F.lit(m)).cast("int")
    bitlen = None
    for k in range(W_BITS):
        term = (h2 >= F.lit(1 << k)).cast("int")
        bitlen = term if bitlen is None else bitlen + term
    rho = (F.lit(W_BITS + 1) - bitlen).cast("int")
    return j, rho


def _init_sketch(v, m: int):
    """array<int> of m registers: rho at bucket j, zero elsewhere."""
    j, rho = _register_cols(v, m)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.when(i == j, rho).otherwise(F.lit(0)),
    )


def _est_expr(sk, m: int):
    """HLL estimate of |ball| from a register array (double, unrounded).

    Left fold over the register array in index order; 2^-r via the
    exact literal table; linear-counting below 2.5m with zero
    registers (the standard small-range correction). The identical
    expression is emitted into the DuckDB twin, so the doubles are
    bit-equal, not just close."""
    inv = F.array(*[F.lit(x) for x in _INV_POW2])
    s = F.aggregate(
        sk, F.lit(0.0), lambda acc, r: acc + F.element_at(inv, r + 1)
    )
    raw = F.lit(_alpha_mm(m)) / s
    zeros = F.size(F.filter(sk, lambda r: r == F.lit(0)))
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw)


def _merge_kernel(m: int):
    """mapInArrow segment register-max: finishes the merge for every
    dst in the (dst-partitioned) input. Vectorized: per batch an
    argsort + np.maximum.reduceat over the flattened (rows, m)
    register matrix; cross-batch accumulation is a dict of m-vectors
    keyed by dst (bounded by distinct vertices per partition)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[int, "np.ndarray"] = {}
        for b in batches:
            if b.num_rows == 0:
                continue
            dst = b.column("dst").to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(b.column("sketch")).to_numpy(
                zero_copy_only=False
            )
            mat = flat.reshape(-1, m)
            order = np.argsort(dst, kind="stable")
            ds, ms = dst[order], mat[order]
            bounds = np.flatnonzero(
                np.concatenate(([True], ds[1:] != ds[:-1]))
            )
            red = np.maximum.reduceat(ms, bounds, axis=0)
            for d, row in zip(ds[bounds].tolist(), red):
                prev = acc.get(d)
                if prev is None:
                    acc[d] = row.copy()
                else:
                    np.maximum(prev, row, out=prev)
        if acc:
            n = len(acc)
            dsts = np.fromiter(acc.keys(), dtype=np.int64, count=n)
            vals = np.concatenate(list(acc.values())).astype(np.int32)
            offsets = pa.array(
                np.arange(0, (n + 1) * m, m, dtype=np.int32)
            )
            sk = pa.ListArray.from_arrays(offsets, pa.array(vals, pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [pa.array(dsts, pa.int64()), sk], ["dst", "sketch"]
            )

    return fn


def hyperball(
    edges: DataFrame,
    order: int | None = None,
    log2m: int = 6,
    mode: str = "out",
    max_iter: int = 64,
    harmonic: bool = False,
    closeness: bool = False,
    engine: str = "jvm",
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
    trace: list | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """edges DF[src,dst] -> DF[id, ball_est (, harmonic_est)].

    mode="out": B(v,t) = vertices reachable FROM v within t hops, so
    each superstep v pulls the sketches of its out-neighbors (the
    scatter therefore runs along REVERSED edges: w sends to every v
    with v->w). mode="in" is the transpose; mode="all" the undirected
    view. harmonic=True requires mode="in" semantics (H(v) counts
    vertices that REACH v) and accumulates
    (est_t - est_{t-1})/t per vertex, clamped at >= 0 (the linear-
    counting/raw crossover can dip, identically in the twin).
    closeness=True (any mode) accumulates the sum of distances
    sum_t t*(est_t - est_{t-1}) the same way and emits the normalized
    inverse-mean-distance estimate (est_T - 1)/sumdist (igraph
    closeness(normalized=True); NULL where nothing is reachable,
    matching igraph's NaN).

    order=None runs until the global register sum is a fixpoint
    (sum of all registers is monotone and strictly increases iff ANY
    register changed — one scalar agg per superstep, computed inside
    the SAME job as the state save via stats_cols, no extra pass);
    order=k runs exactly k supersteps (the twin-checked form).

    trace (optional list) receives one dict per superstep:
    {"t", "nf"} with nf = NF(t) as an exact DECIMAL(28,6) sum of
    round(est, 6) — order-independent and bit-identical across
    engines (a plain double sum over vertices is partial-agg-order
    dependent; decimals are not).
    """
    if harmonic and mode != "in":
        raise ValueError("harmonic centrality needs mode='in' balls")
    accumulate = harmonic or closeness
    spark = edges.sparkSession
    m = 1 << log2m
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if mode == "out":
        send = d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        adj = pack_adjacency(send, buckets=b)
    elif mode == "in":
        adj = pack_adjacency(d, buckets=b)
    elif mode == "all":
        adj = pack_adjacency(d, buckets=b, undirected=True)
    else:
        raise ValueError(f"mode must be out|in|all, got {mode!r}")
    adj = adj.select("src", "neighbors").persist()

    mgr = CheckpointManager(
        checkpoint_dir, "hyperball", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=b,
    )
    t_max = order if order is not None else max_iter
    start_it, state, prev_total = 0, None, None
    if resume:
        found = mgr.latest()
        if found is not None:
            # prev_total stays None: the first post-resume superstep
            # can't early-stop (one possibly-redundant round), after
            # which the fixpoint check is live again
            start_it = found[0] + 1
            state = mgr.load(found[0], "id")

    nf_dec = F.sum(
        F.round(_est_expr(F.col("sketch"), m), 6).cast("decimal(28,6)")
    ).alias("nf")
    reg_total = F.sum(
        F.aggregate(
            F.col("sketch"), F.lit(0).cast("long"),
            lambda acc, r: acc + r.cast("long"),
        )
    ).alias("regs")

    if state is None:
        cols = [
            F.col("id"),
            _init_sketch(F.col("id"), m).alias("sketch"),
        ]
        if accumulate:
            cols.append(
                _est_expr(_init_sketch(F.col("id"), m), m).alias("est_prev")
            )
        if harmonic:
            cols.append(F.lit(0.0).alias("harmonic_est"))
        if closeness:
            cols.append(F.lit(0.0).alias("sumdist_est"))
        state = (
            vertex_universe(edges).select(*cols).repartition(b, "id")
        )
        state, row0 = mgr.save(
            state, -1, "id", counters={"iteration": -1},
            stats_cols=[nf_dec, reg_total],
        )
        prev_total = row0["regs"]
        if trace is not None:
            trace.append({"t": 0, "nf": float(row0["nf"])})

    iterations = start_it
    for it in range(start_it, t_max):
        joined = adj.join(
            state.hint("shuffle_hash"), adj["src"] == state["id"], "inner"
        ).select("neighbors", "sketch")
        msgs = joined.select(F.explode("neighbors").alias("dst"), "sketch")
        allm = msgs.unionAll(
            state.select(F.col("id").alias("dst"), "sketch")
        )
        if engine == "arrow":
            merged = allm.repartition(b, "dst").mapInArrow(
                _merge_kernel(m), "dst long, sketch array<int>"
            )
        else:
            # repartition(dst) FIRST: HashPartitioning(dst) satisfies
            # the (dst, j) clustering too, so both aggs run in one
            # exchange
            merged = (
                allm.repartition(b, "dst")
                .select("dst", F.posexplode("sketch").alias("j", "r"))
                .groupBy("dst", "j")
                .agg(F.max("r").alias("r"))
                .groupBy("dst")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("j", "r"))),
                        lambda s: s["r"],
                    ).alias("sketch")
                )
            )
        if accumulate:
            new_est = _est_expr(merged["sketch"], m)
            delta = F.greatest(F.lit(0.0), new_est - F.col("est_prev"))
            acc_in = ["id", "est_prev"]
            acc_out = ["id", "sketch", new_est.alias("est_prev")]
            if harmonic:
                acc_in.append("harmonic_est")
                acc_out.append(
                    (
                        F.col("harmonic_est") + delta / F.lit(float(it + 1))
                    ).alias("harmonic_est")
                )
            if closeness:
                acc_in.append("sumdist_est")
                acc_out.append(
                    (
                        F.col("sumdist_est") + delta * F.lit(float(it + 1))
                    ).alias("sumdist_est")
                )
            new_state = (
                state.select(*acc_in)
                .join(
                    merged.hint("shuffle_hash"),
                    state["id"] == merged["dst"], "inner",
                )
                .select(*acc_out)
            )
        else:
            new_state = merged.select(F.col("dst").alias("id"), "sketch")
        counters = {"iteration": it}
        new_state, srow = mgr.save(
            new_state, it, "id", counters=counters,
            stats_cols=[nf_dec, reg_total],
        )
        state = new_state
        iterations = it + 1
        if trace is not None:
            trace.append({"t": it + 1, "nf": float(srow["nf"])})
        total = srow["regs"]
        if order is None and total == prev_total:
            break
        prev_total = total
    out_cols = ["id", F.round(_est_expr(F.col("sketch"), m), 6).alias("ball_est")]
    if harmonic:
        out_cols.append(F.round("harmonic_est", 6).alias("harmonic_est"))
    if closeness:
        # normalized (inverse-MEAN-distance) estimator: reachable-1
        # over total distance — the robust sketch form (HyperBall §5);
        # NULL where nothing was ever reached (igraph returns NaN)
        out_cols.append(
            F.round(
                F.when(
                    F.col("sumdist_est") > 0.0,
                    (_est_expr(F.col("sketch"), m) - F.lit(1.0))
                    / F.col("sumdist_est"),
                ),
                6,
            ).alias("closeness_est")
        )
    out = mgr.finalize(state.select(*out_cols))
    adj.unpersist()
    if stats is not None:
        stats["iterations"] = iterations
    return out


def neighborhood_function(
    edges: DataFrame,
    order: int,
    log2m: int = 6,
    mode: str = "out",
    engine: str = "jvm",
    buckets: int | None = None,
) -> DataFrame:
    """DF[t int, nf double] — ANF trace NF(0..order), exact-decimal
    summed (order-independent, twin-hashable)."""
    spark = edges.sparkSession
    tr: list = []
    hyperball(
        edges, order=order, log2m=log2m, mode=mode, engine=engine,
        buckets=buckets, trace=tr,
    )
    return spark.createDataFrame(
        [(r["t"], r["nf"]) for r in tr], "t int, nf double"
    )


def effective_diameter(
    edges: DataFrame,
    q: float = 0.9,
    order: int = 16,
    log2m: int = 6,
    mode: str = "out",
    engine: str = "jvm",
    buckets: int | None = None,
) -> DataFrame:
    """DF[effective_diameter double] — smallest (interpolated) t with
    NF(t) >= q * NF(order), the WebGraph/HyperANF definition:
    t-1 + (q*NF(T) - NF(t-1)) / (NF(t) - NF(t-1)). Runs a fixed
    `order` supersteps so the DuckDB twin can replay it."""
    nf = neighborhood_function(
        edges, order=order, log2m=log2m, mode=mode, engine=engine,
        buckets=buckets,
    )
    # tiny (order+1)-row frame: self-join beats a Window and keeps the
    # twin expression shapes identical
    total = nf.agg(F.max("nf").alias("nft"))
    thr = total.select((F.lit(q) * F.col("nft")).alias("thr"))
    hit = (
        nf.crossJoin(F.broadcast(thr))
        .where(F.col("nf") >= F.col("thr"))
        .agg(F.min("t").alias("t_hit"))
    )
    prev = (
        nf.select(F.col("t").alias("tp"), F.col("nf").alias("nf_prev"))
    )
    cur = nf.select(F.col("t").alias("tc"), F.col("nf").alias("nf_cur"))
    return (
        hit.crossJoin(F.broadcast(thr))
        .join(cur, F.col("tc") == F.col("t_hit"))
        .join(prev, F.col("tp") == F.col("t_hit") - 1, "left")
        .select(
            F.round(
                F.when(F.col("t_hit") == 0, F.lit(0.0)).otherwise(
                    (F.col("t_hit") - 1).cast("double")
                    + (F.col("thr") - F.col("nf_prev"))
                    / (F.col("nf_cur") - F.col("nf_prev"))
                ),
                6,
            ).alias("effective_diameter")
        )
    )


# ---------------------------------------------------------------- #
# DuckDB twins: replay the registers bit-for-bit                    #
# ---------------------------------------------------------------- #


def _sql_inv_pow2() -> str:
    return "[" + ", ".join(repr(x) for x in _INV_POW2) + "]"


def _sql_est(sk: str, m: int) -> str:
    """Estimate expression over a register list column (1-based SQL
    lists) — the exact mirror of _est_expr: left fold in index order,
    shared 2^-r literal table, same LC crossover."""
    s = (
        f"list_reduce(list_prepend(0.0, list_transform({sk}, "
        f"r -> list_extract({_sql_inv_pow2()}, r + 1))), (a, b) -> a + b)"
    )
    zeros = f"len(list_filter({sk}, r -> r = 0))"
    raw = f"({_alpha_mm(m)!r} / {s})"
    return (
        f"(CASE WHEN {raw} <= {2.5 * m!r} AND {zeros} > 0 "
        f"THEN {float(m)!r} * ln({float(m)!r} / {zeros}) "
        f"ELSE {raw} END)"
    )


def _sql_rounds(clean: str, order: int, m: int, mode: str) -> str:
    """WITH-clause prefix: clean, verts, r0..r{order} (id, sk)."""
    if mode == "out":
        step = "SELECT c.src AS u, c.dst AS v FROM clean c"
    elif mode == "in":
        step = "SELECT c.dst AS u, c.src AS v FROM clean c"
    else:
        step = (
            "SELECT c.src AS u, c.dst AS v FROM clean c "
            "UNION ALL SELECT c.dst, c.src FROM clean c"
        )
    bitlen = " + ".join(
        f"(CASE WHEN w >= {1 << k} THEN 1 ELSE 0 END)" for k in range(W_BITS)
    )
    parts = [
        f"clean AS ({clean})",
        "verts AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM clean UNION ALL SELECT dst FROM clean))",
        f"""h AS (
            SELECT id,
                   ((((id % {P}) + {P}) % {P}) * {A1} + {C}) % {P} AS h1,
                   ((((id % {P}) + {P}) % {P}) * {A3}
                    + (((((id % {P}) + {P}) % {P}) * {A1} + {C}) % {P}) * {A2}
                    + {C}) % {P} AS h2
            FROM verts
        )""",
        f"""reg AS (
            SELECT id, ((h1 % {m}) + {m}) % {m} AS j,
                   {W_BITS + 1} - ({bitlen}) AS rho
            FROM (SELECT id, h1, ((h2 % {1 << W_BITS}) + {1 << W_BITS})
                         % {1 << W_BITS} AS w FROM h)
        )""",
        f"""r0 AS (
            SELECT id, list_transform(range({m}),
                   i -> CASE WHEN i = j THEN rho ELSE 0 END) AS sk
            FROM reg
        )""",
    ]
    # AS MATERIALIZED is load-bearing: r{t} references r{t-1} TWICE
    # (scatter join + identity UNION ALL); inlined CTEs would
    # re-evaluate the whole chain 2^order times.
    for t in range(1, order + 1):
        parts.append(f"""r{t} AS MATERIALIZED (
            SELECT id, list(mx ORDER BY j) AS sk FROM (
                SELECT msg.id AS id, idx.j AS j, max(msg.sk[idx.j + 1]) AS mx
                FROM (
                    SELECT s.u AS id, r.sk AS sk
                    FROM ({step}) s
                    JOIN r{t - 1} r ON r.id = s.v
                    UNION ALL SELECT id, sk FROM r{t - 1}
                ) msg
                CROSS JOIN (SELECT unnest(range({m})) AS j) idx
                GROUP BY msg.id, idx.j
            ) GROUP BY id
        )""")
    return ",\n".join(parts)


def hyperball_balls_sql(
    clean: str, order: int, log2m: int = 4, mode: str = "out"
) -> str:
    """Twin of hyperball(order=, log2m=, mode=): DF[id, ball_est]."""
    m = 1 << log2m
    return f"""
        WITH {_sql_rounds(clean, order, m, mode)}
        SELECT id, round({_sql_est('sk', m)}, 6) AS ball_est
        FROM r{order}
    """


def _sql_nf(clean: str, order: int, m: int, mode: str) -> str:
    """WITH-prefix + nf table (t, nf) via exact decimal sums."""
    sels = [
        f"SELECT {t} AS t, CAST(sum(CAST(round({_sql_est('sk', m)}, 6) "
        f"AS DECIMAL(28,6))) AS DOUBLE) AS nf FROM r{t}"
        for t in range(order + 1)
    ]
    return (
        f"WITH {_sql_rounds(clean, order, m, mode)},\n"
        f"nf AS ({' UNION ALL '.join(sels)})"
    )


def neighborhood_function_sql(
    clean: str, order: int, log2m: int = 4, mode: str = "out"
) -> str:
    m = 1 << log2m
    return f"{_sql_nf(clean, order, m, mode)} SELECT t, nf FROM nf"


def effective_diameter_sql(
    clean: str, q: float = 0.9, order: int = 8, log2m: int = 4,
    mode: str = "out",
) -> str:
    m = 1 << log2m
    return f"""
        {_sql_nf(clean, order, m, mode)},
        thr AS (SELECT {q!r} * max(nf) AS thr FROM nf),
        hit AS (SELECT min(t) AS t_hit FROM nf, thr WHERE nf >= thr)
        SELECT round(CASE WHEN h.t_hit = 0 THEN 0.0 ELSE
                   CAST(h.t_hit - 1 AS DOUBLE)
                   + (thr.thr - p.nf) / (c.nf - p.nf)
               END, 6) AS effective_diameter
        FROM hit h
        CROSS JOIN thr
        JOIN nf c ON c.t = h.t_hit
        LEFT JOIN nf p ON p.t = h.t_hit - 1
    """


def hyperball_closeness_sql(
    clean: str, order: int, log2m: int = 4, mode: str = "out"
) -> str:
    """Twin of hyperball(closeness=True, mode=): DF[id, ball_est,
    closeness_est] — per-round est deltas clamped at >= 0, weighted
    by t into sumdist; closeness = (est_T - 1)/sumdist, NULL when
    sumdist = 0 (isolated)."""
    m = 1 << log2m
    sumdist = " + ".join(
        f"greatest(0.0, {_sql_est(f'r{t}.sk', m)} "
        f"- {_sql_est(f'r{t - 1}.sk', m)}) * {float(t)!r}"
        for t in range(1, order + 1)
    )
    joins = " ".join(
        f"JOIN r{t} ON r{t}.id = r0.id" for t in range(1, order + 1)
    )
    final = _sql_est(f"r{order}.sk", m)
    return f"""
        WITH {_sql_rounds(clean, order, m, mode)}
        SELECT r0.id AS id,
               round({final}, 6) AS ball_est,
               round(CASE WHEN ({sumdist}) > 0.0
                     THEN ({final} - 1.0) / ({sumdist}) END, 6)
                   AS closeness_est
        FROM r0 {joins}
    """


def hyperball_harmonic_sql(
    clean: str, order: int, log2m: int = 4
) -> str:
    """Twin of hyperball(harmonic=True, mode='in'): DF[id,
    harmonic_est] — per-round est deltas clamped at >= 0, div by t."""
    m = 1 << log2m
    ests = " + ".join(
        f"greatest(0.0, {_sql_est(f'r{t}.sk', m)} "
        f"- {_sql_est(f'r{t - 1}.sk', m)}) / {float(t)!r}"
        for t in range(1, order + 1)
    )
    joins = " ".join(
        f"JOIN r{t} ON r{t}.id = r0.id" for t in range(1, order + 1)
    )
    return f"""
        WITH {_sql_rounds(clean, order, m, 'in')}
        SELECT r0.id AS id, round({ests}, 6) AS harmonic_est
        FROM r0 {joins}
    """
