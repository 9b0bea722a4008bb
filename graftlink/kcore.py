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
            e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
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
) -> DataFrame:
    """DF[id, core] — the largest k such that id is in the k-core,
    via h-index propagation (one superstep loop, see module doc).
    Isolated vertices (only in `vertices`) get core 0."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (vertices or vertex_universe(edges)).select("id")
    und = _und_edges(edges)
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = pack_adjacency(sym, buckets=b).persist()
    mgr = CheckpointManager(None, "coreness", spark, mode="local", buckets=b)

    # out_deg of the symmetric pack IS the simple-graph degree; taking
    # it from adj avoids a second degree scan (salt-split hub rows all
    # carry the full degree, hence the distinct)
    deg = adj.select(F.col("src").alias("id"), F.col("out_deg").alias("h")).distinct()

    # Global clip B >= k_max: a k-core needs >= k(k+1)/2 edges, so
    # coreness <= sqrt(2m). The h-index operator commutes with
    # min-clipping at B >= k_max (clipping only moves mass that sits
    # strictly above every reachable h-index), so iterating on
    # h~ = min(h, B) reaches the SAME fixpoint = coreness while
    # bounding every per-vertex histogram at B+1 distinct bins.
    m = und.count()
    clip_b = int(math.isqrt(2 * m)) + 1

    state = (
        verts.join(deg, "id", "left")
        .select(
            "id",
            F.least(F.coalesce("h", F.lit(0)), F.lit(clip_b)).cast("long").alias("h"),
        )
        .repartition(b, "id")
    )

    for it in range(max_rounds):
        joined = adj.select("src", "neighbors").join(
            state.hint("shuffle_hash"), adj["src"] == state["id"], "inner"
        ).select("neighbors", "h")
        msgs = joined.select(F.explode("neighbors").alias("dst"), "h")
        # H(v) = h-index of the neighbor estimates, via a bounded
        # counting histogram instead of a per-dst row_number sort
        # (round 2's Window put every hub message in ONE reducer
        # partition and sorted it there — the skew class the salted
        # pack exists to kill, and the engine's slowest bench row).
        # Two skew-immune steps:
        #   1. groupBy(dst, h).count — map-side partial agg absorbs the
        #      hub fan-in; rows per dst <= min(deg, #distinct h) and
        #      #distinct h <= 2*sqrt(m) globally (sum of d distinct
        #      degree values >= d(d+1)/2), collapsing toward ~k_max as
        #      the estimates tighten. The global clip_b init bounds
        #      every bin value at sqrt(2m)+1.
        #   2. per-dst argmax over the sorted distinct bins:
        #      H = max_j min(v_j, suffix_count_j) — an array fold over
        #      the bins, JVM-side, no Window. (No per-dst value clip:
        #      H <= current h(dst) already holds by the monotone
        #      decrease of the h-sequence, so clipping bins at h(dst)
        #      cannot change H — it would only add a join per round.)
        cnts = msgs.groupBy("dst", "h").agg(F.count("*").alias("c"))
        hist = cnts.groupBy("dst").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("h").alias("hc"), "c")), asc=False
            ).alias("bins")
        )
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
        new_state = state.join(
            hh.hint("shuffle_hash"), state["id"] == hh["dst"], "left"
        ).select(
            "id",
            F.coalesce("new_h", F.col("h")).alias("h"),
            F.col("h").alias("prev_h"),
        )
        new_state, row = mgr.save(
            new_state, it, "id", counters={"iteration": it},
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
