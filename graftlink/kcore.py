"""k-core decomposition.

igraph surface matched: igraph_coreness (igraph@0.10.x
src/properties/degrees.c [unverified split] — bucket-queue peeling)
and the `k_core` subgraph extraction python-igraph exposes.

Two distributed shapes:

- `k_core(edges, k)` — iterative deletion rounds for ONE k: repeat
  { drop vertices with remaining degree < k } until a fixpoint. Each
  round is one degree groupBy + two semi-joins; the edge set only
  shrinks and round count is bounded by the longest peeling chain
  (webgraphs: tens).
- `core_numbers(edges)` — h-index propagation (Montresor,
  De Pellegrini, Miorandi, "Distributed k-core decomposition", 2011):
  h(v) starts at degree and each superstep sets
  h(v) <- H({h(u) : u in N(v)}), the h-index of the neighbor
  estimates. The sequence is monotone non-increasing and its fixpoint
  is exactly coreness, reached in O(rounds-to-converge) supersteps
  INDEPENDENT of k_max — round 1 peeled k = 1..k_max sequentially
  (thousands of driver-synchronous jobs on a web graph); this runs
  the same superstep loop as pagerank/lpa over the packed adjacency.

Value gates: pytest vs networkx.core_number (exact) and the driver's
recursive-CTE DuckDB twin (graftlink/iterative_sql.py), which
iterates the same operator to the same fixpoint.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager


def _und_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _peel(und: DataFrame, k: int, max_rounds: int = 200) -> DataFrame:
    """Iteratively delete vertices with degree < k; returns the
    surviving undirected edge set (possibly empty)."""
    e = und.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("a").alias("id"))
            .unionAll(e.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("id")
        new_e = (
            e.join(keep.withColumnRenamed("id", "a").hint("shuffle_hash"),
                   "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b").hint("shuffle_hash"),
                  "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        if new_e.count() == e.count():
            return new_e
        e = new_e
    return e


def k_core(edges: DataFrame, k: int) -> DataFrame:
    """DF[id] — vertices of the maximal subgraph with min degree >= k."""
    core_edges = _peel(_und_edges(edges), k)
    return (
        core_edges.select(F.col("a").alias("id"))
        .unionAll(core_edges.select(F.col("b").alias("id")))
        .distinct()
    )


def core_numbers(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    buckets: int | None = None,
    max_rounds: int = 200,
    unroll: int = 1,
    mode: str = "all",
) -> DataFrame:
    """DF[id, core] — the largest k such that id is in the k-core,
    via h-index propagation (one superstep loop, see module doc).
    Isolated vertices (only in `vertices`) get core 0.

    `mode` is igraph coreness(mode=): "all" treats edges as
    undirected (default); "in" peels on IN-degree (the k-in-core is
    the maximal subgraph where every vertex has >= k in-neighbors
    inside it), "out" on OUT-degree. The Montresor locality/fixpoint
    argument transfers verbatim: in-coreness(v) =
    H({in-coreness(u) : u an IN-neighbor of v}) — at the fixpoint the
    set {u : h(u) >= k} is its own k-in-core, and h >= coreness is an
    invariant of the iteration — so the directed modes run the SAME
    fused kernel with the scatter graph oriented sender->receiver =
    in-neighbor->vertex ("in") or out-neighbor->vertex ("out") and h
    initialized to the matching directed degree (clip B: a k-in-core
    has >= k(k+1) <= m edges, so B = isqrt(m)+1).

    Round-4 kernel: ONE exchange per superstep. The message stream is
    explicitly repartitioned on dst; hash(dst) partitioning satisfies
    BOTH downstream groupings (groupBy(dst,h) then groupBy(dst) — a
    HashPartitioning whose keys are a subset of the grouping keys
    needs no further Exchange), so the (dst,h) count, the bin
    collect, and the h-index array fold all pipeline inside the same
    post-shuffle stage. Round 3 paid two chained agg exchanges here
    (hash(dst,h) then hash(dst)); round 2 paid one exchange plus a
    full per-partition SORT for a row_number Window. Interleaved A/B
    on the 2e6-edge bench graph (BENCH/AB_r04.md, medians of 3):
    fused 23.3s vs window 23.4s vs two-shuffle 26.2s — fused matches
    the window kernel's wall at this scale (per-round driver overhead
    dominates locally) while keeping the shape that wins at 100x: one
    exchange of narrow rows, no per-partition sort, hub fan-in
    absorbed by hash aggregation. Two rejected r4 experiments, both
    measured in the same harness: a delta-frontier kernel (recompute
    only neighbors of changed vertices — Montresor's message
    discipline) lost outright at 72s median because the frontier
    decays too slowly on a power-law graph to amortize its extra
    semi-join + distinct per round; and unroll=2 (below) measured
    27.7s.

    `unroll` evaluates that many h-index updates lazily per
    materialized job (state' = H(H(state)) for unroll=2): the
    supersteps still exchange once each, but persist / convergence
    stats / scheduling overhead is paid once per block. Measured
    SLOWER at unroll=2 (27.7s vs 23.3s — the doubled-depth lazy plan
    costs more in optimizer/AQE work than the saved job overhead), so
    the default is 1; the parameter stays for re-measurement on real
    multi-executor clusters where per-job driver latency is higher.
    The block is exact regardless: the operator is monotone and
    idempotent past its fixpoint, and the block-level changed count
    hits 0 exactly when the round-level one does.
    """
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (vertices or vertex_universe(edges)).select("id")
    if mode == "all":
        und = _und_edges(edges)
        sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
    elif mode in ("in", "out"):
        dedup = (
            edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        # sender -> receiver: the receiver's h must aggregate its
        # in-neighbors' ("in") or out-neighbors' ("out") estimates
        sym = (
            dedup
            if mode == "in"
            else dedup.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        raise ValueError(f"coreness mode must be all|in|out, got {mode!r}")
    adj = pack_adjacency(sym, buckets=b).persist()
    # a block references `state` ~5x in its lazy plan (2 per unrolled
    # superstep + the prev_h join), so truncate every 2 blocks (25x
    # plan copies max) instead of the default 4 (625x — the walktrap
    # plan-blowup class)
    mgr = CheckpointManager(
        None, "coreness", spark, mode="local", buckets=b, truncate_every=2
    )

    if mode == "all":
        # out_deg of the symmetric pack IS the simple-graph degree;
        # taking it from adj avoids a second degree scan (salt-split
        # hub rows all carry the full degree, hence the distinct)
        deg = adj.select(
            F.col("src").alias("id"), F.col("out_deg").alias("h")
        ).distinct()
        # Global clip B >= k_max: a k-core needs >= k(k+1)/2 edges, so
        # coreness <= sqrt(2m). The h-index operator commutes with
        # min-clipping at B >= k_max (clipping only moves mass that
        # sits strictly above every reachable h-index), so iterating
        # on h~ = min(h, B) reaches the SAME fixpoint = coreness while
        # bounding every per-vertex histogram at B+1 distinct bins.
        m = und.count()
        clip_b = int(math.isqrt(2 * m)) + 1
    else:
        # directed degree of the RECEIVER = fan-in of the scatter graph
        deg = sym.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("h")
        )
        m = sym.count()
        clip_b = int(math.isqrt(m)) + 1

    state = (
        verts.join(deg.hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            F.least(F.coalesce("h", F.lit(0)), F.lit(clip_b)).cast("long").alias("h"),
        )
        .repartition(b, "id")
    )

    def step(cur: DataFrame) -> DataFrame:
        """One lazy h-index superstep: cur[id,h] -> [id,h]. All joins
        are colocated shuffle_hash (adj hash(src,b), state hash(id,b),
        agg output hash(dst,b)); the single Exchange is the explicit
        message repartition."""
        joined = adj.select("src", "neighbors").join(
            cur.hint("shuffle_hash"), adj["src"] == cur["id"], "inner"
        ).select("neighbors", "h")
        msgs = joined.select(F.explode("neighbors").alias("dst"), "h")
        # H(v) = h-index of the neighbor estimates, via a bounded
        # counting histogram: rows per dst after the count step
        # <= min(deg, #distinct h), #distinct h <= 2*sqrt(m) globally,
        # bins clipped at clip_b — skew-immune, no Window, no sort of
        # the m-row stream.
        cnts = (
            msgs.repartition(b, "dst")
            .groupBy("dst", "h")
            .agg(F.count("*").alias("c"))
        )
        hist = cnts.groupBy("dst").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("h").alias("hc"), "c")), asc=False
            ).alias("bins")
        )
        # per-dst argmax over the desc-sorted distinct bins:
        # H = max_j min(v_j, suffix_count_j) — a JVM array fold.
        hh = hist.select(
            "dst",
            F.aggregate(
                "bins",
                F.struct(
                    F.lit(0).cast("long").alias("s"),
                    F.lit(0).cast("long").alias("best"),
                ),
                lambda acc, x: F.struct(
                    (acc["s"] + x["c"]).alias("s"),
                    F.greatest(
                        acc["best"], F.least(x["hc"], acc["s"] + x["c"])
                    ).alias("best"),
                ),
                lambda acc: acc["best"],
            ).alias("new_h"),
        )
        return cur.join(
            hh.hint("shuffle_hash"), cur["id"] == hh["dst"], "left"
        ).select("id", F.coalesce("new_h", F.col("h")).alias("h"))

    for blk, it in enumerate(range(0, max_rounds, unroll)):
        nxt = state
        for _ in range(unroll):
            nxt = step(nxt)
        new_state = nxt.withColumnRenamed("h", "new_h").join(
            state.hint("shuffle_hash"), "id"
        ).select("id", F.col("new_h").alias("h"), F.col("h").alias("prev_h"))
        new_state, row = mgr.save(
            new_state, blk, "id", counters={"iteration": it},
            stats_cols=[
                F.sum((F.col("h") != F.col("prev_h")).cast("long")).alias("c")
            ],
        )
        state = new_state.select("id", "h")
        if not row["c"]:
            break
    result = mgr.finalize(state.select("id", F.col("h").alias("core")))
    adj.unpersist()
    return result
