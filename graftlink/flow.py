"""s-t maximum flow / minimum cut — synchronous push-relabel.

igraph surface matched: `igraph_maxflow` / `igraph_st_mincut`
(igraph@0.10.x src/flow/st-cuts.c, flow.c [unverified files]; igraph
uses Goldberg-Tarjan push-relabel with gap + global-relabel
heuristics). This removes maxflow/mincut from SURVEY.md's
"deliberately absent" ledger: the absence rationale was
"augmenting-path sequential", but push-relabel is NOT an
augmenting-path method — it is locally greedy per vertex and has a
classic synchronous (BSP) formulation in which every active vertex
pushes/relabels in the same superstep, which is exactly the engine's
frontier-join shape.

PHASE 1 ONLY, by design. Goldberg-Tarjan splits in two phases:
phase 1 drives the max PREFLOW to the sink (active = excess > 0 AND
height < n; vertices lifted to h >= n can provably never reach t
again), after which e(t) IS the max-flow value and the cut
(V \\ T, T) with T = {v : v reaches t in the residual graph} is a
minimum cut (Goldberg & Tarjan 1988, §3 — the first phase suffices
for value + cut). Phase 2 (returning trapped excess to s) only
refines the PER-ARC flow assignment, which is not unique across max
flows anyway — and in a synchronous BSP setting phase 2 is the
round-heavy part (excess drains ping-pong between local relabels).
We skip it: the engine's query surface is value + canonical cut +
partition, same as igraph's `maxflow().value` / `mincut(s, t)`.

Algorithm (synchronous Goldberg-Tarjan, phase 1):
- state: ONE vertex frame DF[id, h, e] (height + excess); residual
  capacity r(u,v) per arc, with BOTH directions of every capacity
  edge materialized once so reverse-arc credits are plain joins,
  never inserts.
- init: h = exact residual distance-to-t (a global relabel), h(s)=n
  pinned; saturate every s out-arc.
- superstep: every active vertex (e>0, h<n, not s/t) pushes along ALL
  its admissible arcs (r>0 and h(u)=h(w)+1, heights frozen at round
  start) in deterministic neighbor order, amounts computed by ONE
  JVM-side `aggregate` fold over the sorted arc array (prefix-capped
  by the excess — no window, no Python); active vertices that pushed
  nothing (== had no admissible arc, since an admissible arc always
  absorbs positive flow) relabel to 1 + min residual-neighbor height.
  Simultaneous opposite pushes on one arc are impossible
  (h(u)=h(w)+1 and h(w)=h(u)+1 cannot both hold), so the synchronous
  step needs no locking — the Goldberg-Tarjan termination argument
  is unchanged.
- every `global_relabel_every` rounds: recompute h exactly as
  distance-to-t in the residual graph (BFS from t over reversed
  residual arcs); vertices cut off from t get h = n (inactive
  forever). Labels only ever INCREASE (greatest(old, exact), and a
  cut-off vertex never has a residual arc to a t-reaching one, so
  label validity h(u) <= h(v)+1 is preserved) — the standard
  global-relabel heuristic that keeps superstep counts near the
  residual diameter instead of the O(n^2) worst case.

Determinism: arc order inside a vertex's push fold is sort_array on
(w); relabel is a min; the global relabel is a BFS — no randomness
anywhere, so the converged PREFLOW is identical run-to-run, and the
canonical MAXIMAL source-side min cut (S* = V minus the
residual-reach-to-t set, unique across ALL maximum flows by
max-flow/min-cut lattice theory) is the hash-stable query surface.
Per-arc assignments are a max PREFLOW (excess may rest at interior
vertices with h >= n), so parity tests compare value + canonical
cut, not flow matrices.

Driver-job discipline (local-mode physics, same lesson as mst.py):
every per-round materialization is `localCheckpoint(eager=False)`
followed by the ONE action that needs its statistic (count / agg), so
a superstep costs 2-3 Spark jobs, not 6 — eager checkpoints and
isEmpty probes each pay a full job and were the dominant wall at
small scale. Push-free rounds skip the residual rewrite entirely.

100 TB shape: residual arcs stay hash-partitioned by (u, v) and are
updated by frontier-sized left joins; the vertex state frame is
updated the CC/LPA way; per-round work is O(active-degree) after
partial aggs. DECLARED ENVELOPE: push-relabel does O(n^2.sqrt(m))
pushes worst-case and s-t flow is inherently round-heavy versus the
engine's other supersteps — this is a parity operator for targeted
(s, t) questions, not a whole-corpus sweep (igraph pays the same
asymptotics single-node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.lineage import cut

_PUSH_FOLD = """
    filter(
        aggregate(
            arcs,
            named_struct('rem', CAST(e AS DOUBLE),
                         'out', CAST(array() AS array<struct<w: bigint, amt: double>>)),
            (acc, x) -> named_struct(
                'rem', acc.rem - least(x.r, acc.rem),
                'out', array_append(acc.out,
                                    named_struct('w', x.w,
                                                 'amt', least(x.r, acc.rem)))),
            acc -> acc.out),
        p -> p.amt > 0)
"""


def _caps(edges: DataFrame, cap_col: str | None, directed: bool) -> DataFrame:
    """Simple capacity arcs DF[u, v, cap]: parallel arcs sum their
    capacities (igraph maxflow semantics), self-loops drop, an
    undirected edge becomes two independent arcs of the same capacity
    (igraph's undirected-maxflow convention)."""
    w = (
        F.col(cap_col).cast("double")
        if cap_col is not None
        else F.lit(1.0)
    )
    arcs = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"), w.alias("cap"))
    if not directed:
        arcs = arcs.unionAll(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"), w.alias("cap"))
        )
    return (
        arcs.where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("cap").alias("cap"))
    )


def _residual_bfs(
    res_pos: DataFrame, root: int, reverse: bool, max_depth: int
) -> DataFrame:
    """DF[id, d] — hop distance in the residual graph, either TO
    `root` (reverse=True: follow arcs backwards from root, so d(v) is
    the length of a residual v->root path) or FROM `root`
    (reverse=False). Frontier BFS at ONE driver job per depth: the
    visited set is a lazy union of the per-depth checkpointed
    frontiers (mst.py's accumulator-list discipline)."""
    hop = (
        res_pos.select(F.col("v").alias("at"), F.col("u").alias("nxt"))
        if reverse
        else res_pos.select(F.col("u").alias("at"), F.col("v").alias("nxt"))
    )
    spark = res_pos.sparkSession
    frontier = spark.createDataFrame([(root,)], "id long").transform(lambda d: cut(d, eager=True))
    levels = [frontier.select("id", F.lit(0).cast("long").alias("d"))]
    visited = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            hop.join(frontier.hint("shuffle_hash"), hop["at"] == frontier["id"])
            .select(F.col("nxt").alias("id"))
            .distinct()
            .join(visited.hint("shuffle_hash"), "id", "left_anti")
            .transform(lambda d: cut(d, eager=False))
        )
        if nxt.count() == 0:
            break
        levels.append(nxt.select("id", F.lit(depth).cast("long").alias("d")))
        visited = visited.unionByName(nxt)
        frontier = nxt
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out


def _global_relabel(
    residual: DataFrame,
    universe: DataFrame,
    s: int,
    t: int,
    n: int,
    max_depth: int,
) -> DataFrame:
    """Exact height labels DF[id, h]: h = d(v, t) in the residual
    graph when t is residual-reachable, else n (cut off from t —
    inactive for the rest of phase 1). h(s) pinned to n, h(t) to 0
    (Goldberg-Tarjan invariants). Validity is preserved because a
    cut-off vertex has, by definition, no positive-residual arc into
    a t-reaching vertex."""
    res_pos = residual.where(F.col("r") > 0)
    dt = _residual_bfs(res_pos, t, reverse=True, max_depth=max_depth)
    return (
        universe.join(dt.withColumnRenamed("d", "_dt").hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            F.when(F.col("id") == s, F.lit(n).cast("long"))
            .when(F.col("id") == t, F.lit(0).cast("long"))
            .otherwise(F.coalesce(F.col("_dt"), F.lit(n).cast("long")))
            .alias("h"),
        )
    )


def max_flow(
    edges: DataFrame,
    s: int,
    t: int,
    cap_col: str | None = None,
    directed: bool = True,
    max_rounds: int = 2000,
    global_relabel_every: int = 8,
    buckets: int | None = None,
) -> tuple[float, DataFrame]:
    """(value, DF[u, v, r]) — the maximum s->t flow VALUE plus the
    phase-1 residual-capacity table (from which the canonical min cut
    derives; `cap - r` is a max PREFLOW, see module docstring).
    igraph surface: `igraph_maxflow` value /
    `Graph.maxflow(...).value`.

    See the module docstring for the synchronous push-relabel round
    and the declared envelope. Raises if s == t or if phase 1 has
    not converged after `max_rounds` supersteps."""
    if s == t:
        raise ValueError("max_flow requires s != t")
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    caps = _caps(edges, cap_col, directed).transform(lambda d: cut(d, eager=True))
    universe = (
        caps.select(F.col("u").alias("id"))
        .unionAll(caps.select(F.col("v").alias("id")))
        .distinct()
        .transform(lambda d: cut(d, eager=False))
    )
    n = universe.count()
    # materialize BOTH directions of every capacity edge once, so a
    # push's reverse-arc credit is always an update, never an insert
    residual = (
        caps.select("u", "v", F.col("cap").alias("r"))
        .unionAll(caps.select(F.col("v").alias("u"), F.col("u").alias("v"), F.lit(0.0).alias("r")))
        .groupBy("u", "v")
        .agg(F.sum("r").alias("r"))
        .repartition(b, "u", "v")
        .transform(lambda d: cut(d, eager=True))
    )
    # saturate s's out-arcs (the preflow seed)
    seed = residual.where((F.col("u") == s) & (F.col("r") > 0)).select(
        "u", "v", F.col("r").alias("amt")
    )
    rupd = seed.select("u", "v", (-F.col("amt")).alias("dr")).unionAll(
        seed.select(F.col("v").alias("u"), F.col("u").alias("v"), F.col("amt").alias("dr"))
    )
    residual = (
        residual.join(rupd.hint("shuffle_hash"), ["u", "v"], "left")
        .select("u", "v", (F.col("r") + F.coalesce("dr", F.lit(0.0))).alias("r"))
        .transform(lambda d: cut(d, eager=True))
    )
    seed_e = seed.groupBy(F.col("v").alias("id")).agg(F.sum("amt").alias("_se"))
    state = (
        _global_relabel(residual, universe, s, t, n, max_rounds)
        .join(seed_e.hint("shuffle_hash"), "id", "left")
        .select("id", "h", F.coalesce("_se", F.lit(0.0)).alias("e"))
        .transform(lambda d: cut(d, eager=False))
    )
    # phase 1: a vertex lifted to h >= n can never route excess to t
    # again — it goes inactive and its excess stays trapped (returning
    # it to s is phase 2, deliberately skipped; module docstring).
    is_active = (F.col("e") > 0) & (F.col("h") < n) & ~F.col("id").isin(s, t)
    n_active = state.agg(F.sum(is_active.cast("long"))).collect()[0][0] or 0

    for rnd in range(max_rounds):
        if not n_active:
            break
        if rnd and rnd % global_relabel_every == 0:
            # labels may only increase: exact BFS distances are >= the
            # current lower-bound labels except where local relabels
            # already climbed past them — keep the max of the two.
            state = (
                _global_relabel(residual, universe, s, t, n, max_rounds)
                .withColumnRenamed("h", "_hx")
                .join(state.hint("shuffle_hash"), "id")
                .select("id", F.greatest("_hx", "h").alias("h"), "e")
                .transform(lambda d: cut(d, eager=False))
            )
        res_pos = residual.where(F.col("r") > 0)
        active = state.where(is_active).select("id", "e")
        hw = state.select(F.col("id").alias("v"), F.col("h").alias("hw"))
        hu = state.select(F.col("id").alias("u"), F.col("h").alias("hu"))
        adm = (
            res_pos.join(active.hint("shuffle_hash"), res_pos["u"] == active["id"])
            .select("u", "v", "r", "e")
            .join(hu.hint("shuffle_hash"), "u")
            .join(hw.hint("shuffle_hash"), "v")
            .where(F.col("hu") == F.col("hw") + 1)
        )
        # push fold: deterministic neighbor order, prefix-capped by
        # the excess, one JVM aggregate per active vertex — no window
        pushes = (
            adm.groupBy("u", "e")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col("v").alias("w"), F.col("r")))
                ).alias("arcs")
            )
            .select("u", F.explode(F.expr(_PUSH_FOLD)).alias("p"))
            .select("u", F.col("p.w").alias("v"), F.col("p.amt").alias("amt"))
            .transform(lambda d: cut(d, eager=False))
        )
        n_push = pushes.count()
        # actives that pushed nothing had no admissible arc (an
        # admissible arc always absorbs positive flow) -> relabel
        stuck = active.join(
            pushes.select(F.col("u").alias("id")).distinct().hint("shuffle_hash"),
            "id",
            "left_anti",
        )
        relab = (
            res_pos.join(stuck.hint("shuffle_hash"), res_pos["u"] == stuck["id"])
            .select("u", "v")
            .join(hw.hint("shuffle_hash"), "v")
            .groupBy("u")
            .agg((F.min("hw") + F.lit(1)).alias("_nh"))
            .withColumnRenamed("u", "id")
        )
        if n_push:
            rupd = (
                pushes.select("u", "v", (-F.col("amt")).alias("dr"))
                .unionAll(
                    pushes.select(
                        F.col("v").alias("u"), F.col("u").alias("v"), F.col("amt").alias("dr")
                    )
                )
                .groupBy("u", "v")
                .agg(F.sum("dr").alias("dr"))
            )
            residual = (
                residual.join(rupd.hint("shuffle_hash"), ["u", "v"], "left")
                .select("u", "v", (F.col("r") + F.coalesce("dr", F.lit(0.0))).alias("r"))
                .transform(lambda d: cut(d, eager=True))
            )
        eupd = (
            pushes.select(F.col("u").alias("id"), (-F.col("amt")).alias("de"))
            .unionAll(pushes.select(F.col("v").alias("id"), F.col("amt").alias("de")))
            .groupBy("id")
            .agg(F.sum("de").alias("de"))
        )
        state = (
            state.join(eupd.hint("shuffle_hash"), "id", "left")
            .join(relab.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.coalesce("_nh", "h").alias("h"),
                (F.col("e") + F.coalesce("de", F.lit(0.0))).alias("e"),
            )
            .transform(lambda d: cut(d, eager=False))
        )
        n_active = state.agg(F.sum(is_active.cast("long"))).collect()[0][0] or 0
    else:
        raise RuntimeError(
            f"max_flow preflow not converged after max_rounds={max_rounds}"
        )
    row = state.where(F.col("id") == t).select("e").collect()
    return (float(row[0]["e"]) if row else 0.0, residual)


def st_mincut(
    edges: DataFrame,
    s: int,
    t: int,
    cap_col: str | None = None,
    directed: bool = True,
    max_rounds: int = 2000,
    buckets: int | None = None,
) -> tuple[float, DataFrame, DataFrame]:
    """(value, DF[u, v, cap] cut arcs, DF[id, in_s] sides) — the
    CANONICAL maximal source-side minimum s-t cut: S* = V \\ T where
    T = {v : v residual-reaches t} at the converged max preflow
    (Goldberg & Tarjan 1988 — phase 1 suffices; T is the unique
    MINIMAL sink side across all maximum flows, so S* is the unique
    maximal source side of the min-cut lattice). Cut arcs are the
    capacity arcs leaving S*, and sum(cap) == maxflow value (asserted
    by the parity tests). igraph surface: `igraph_st_mincut` /
    `Graph.mincut(s, t)` value+partition."""
    value, residual = max_flow(
        edges, s, t, cap_col, directed, max_rounds, buckets=buckets
    )
    t_side = _residual_bfs(
        residual.where(F.col("r") > 0), t, reverse=True, max_depth=max_rounds
    ).select("id")
    caps = _caps(edges, cap_col, directed)
    sides = (
        caps.select(F.col("u").alias("id"))
        .unionAll(caps.select(F.col("v").alias("id")))
        .distinct()
        .join(t_side.withColumn("_t", F.lit(True)).hint("shuffle_hash"), "id", "left")
        .select("id", F.coalesce(~F.col("_t"), F.lit(True)).alias("in_s"))
    )
    tu = t_side.withColumnRenamed("id", "u")
    tv = t_side.withColumnRenamed("id", "v")
    cut = (
        caps.join(tu.hint("shuffle_hash"), "u", "left_anti")
        .join(tv.hint("shuffle_hash"), "v", "left_semi")
        .select("u", "v", "cap")
    )
    return value, cut, sides


def st_edge_connectivity(
    edges: DataFrame,
    s: int,
    t: int,
    directed: bool = True,
    max_rounds: int = 2000,
    buckets: int | None = None,
) -> float:
    """igraph `st_edge_connectivity` / `edge_disjoint_paths`: the
    number of pairwise edge-disjoint s->t paths == unit-capacity max
    flow (Menger). Parallel input edges each count (igraph semantics;
    _caps sums per-arc units)."""
    value, _ = max_flow(
        edges, s, t, cap_col=None, directed=directed,
        max_rounds=max_rounds, buckets=buckets,
    )
    return value


def st_vertex_connectivity(
    edges: DataFrame,
    s: int,
    t: int,
    directed: bool = True,
    max_rounds: int = 2000,
    buckets: int | None = None,
) -> float:
    """igraph `st_vertex_connectivity` / `vertex_disjoint_paths`: the
    number of internally vertex-disjoint s->t paths, via the standard
    node-splitting reduction (Even 1975): every vertex v becomes
    v_in = 2v, v_out = 2v+1 with a unit internal arc; each original
    arc (u, v) becomes (u_out, v_in) with effectively-infinite
    capacity (n units — a max flow never exceeds n). s and t keep an
    unconstrained internal arc. The reduction is a pure column map on
    the edge table, so the flow kernel's partitioning story is
    unchanged. Raises when (s, t) is an edge — vertex connectivity is
    undefined for adjacent vertices (igraph raises too)."""
    if s == t:
        raise ValueError("st_vertex_connectivity requires s != t")
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.where(F.col("src") != F.col("dst")).distinct()
    if not e.where((F.col("src") == s) & (F.col("dst") == t)).isEmpty():
        raise ValueError(
            "st_vertex_connectivity undefined for adjacent (s, t)"
        )
    n = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    big = float(n + 1)
    arcs = e.select(
        (F.col("src") * 2 + 1).alias("src"),
        (F.col("dst") * 2).alias("dst"),
        F.lit(big).alias("cap"),
    )
    internal = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .select(
            (F.col("id") * 2).alias("src"),
            (F.col("id") * 2 + 1).alias("dst"),
            F.when(F.col("id").isin(s, t), F.lit(big))
            .otherwise(F.lit(1.0))
            .alias("cap"),
        )
    )
    value, _ = max_flow(
        arcs.unionByName(internal), 2 * s + 1, 2 * t,
        cap_col="cap", directed=True, max_rounds=max_rounds, buckets=buckets,
    )
    return value
