"""Interleaved A/B of the coreness kernels (round-4 verdict item #1).

Runs, on the SAME persisted bench graph in ONE session, the kernel
order repeated REPS times (interleaving controls for session drift /
box noise):

  window_r2 = round-2 Window kernel (row_number per dst — 24.17s row)
  hist2x_r3 = round-3 histogram, two chained agg exchanges (31.49s row)
  fused_u1  = round-4 fused single-exchange kernel, 1 superstep/job
  fused_u2  = round-4 fused kernel, 2 supersteps unrolled per job
              (graftlink.kcore.core_numbers default)

A first A/B of this round also measured a delta-frontier kernel
(recompute only neighbors of changed vertices): medians 72.2s vs
31.2s (window) / 42.1s (hist) — the frontier decays too slowly on a
power-law graph to amortize its extra semi-join + distinct per
round; the kernel was removed (ab_coreness.log, BENCH/AB_r04.md).

Prints per-run walls + per-kernel medians and verifies all kernels
agree exactly on every run.
"""
from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager
from graftlink.kcore import _und_edges, core_numbers

N_VERTICES = int(os.environ.get("GRAFTLINK_BENCH_VERTICES", "200000"))
N_EDGES = int(os.environ.get("GRAFTLINK_BENCH_EDGES", "2000000"))
REPS = int(os.environ.get("AB_REPS", "3"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _loop(edges, hh_of_msgs, clip=False, max_rounds=200):
    """Shared superstep harness; `hh_of_msgs(msgs, b) -> DF[dst,new_h]`
    is the per-kernel h-index reduction."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = vertex_universe(edges).select("id")
    und = _und_edges(edges)
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = pack_adjacency(sym, buckets=b).persist()
    mgr = CheckpointManager(None, "coreness", spark, mode="local", buckets=b)
    deg = adj.select(F.col("src").alias("id"), F.col("out_deg").alias("h")).distinct()
    h0 = F.coalesce("h", F.lit(0))
    if clip:
        m = und.count()
        h0 = F.least(h0, F.lit(int(math.isqrt(2 * m)) + 1))
    state = (
        verts.join(deg, "id", "left")
        .select("id", h0.cast("long").alias("h"))
        .repartition(b, "id")
    )
    for it in range(max_rounds):
        joined = adj.select("src", "neighbors").join(
            state.hint("shuffle_hash"), adj["src"] == state["id"], "inner"
        ).select("neighbors", "h")
        msgs = joined.select(F.explode("neighbors").alias("dst"), "h")
        hh = hh_of_msgs(msgs, b)
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


def _window_hh(msgs, b):
    w = Window.partitionBy("dst").orderBy(F.col("h").desc())
    return (
        msgs.withColumn("rn", F.row_number().over(w))
        .groupBy("dst")
        .agg(F.max(F.least(F.col("rn").cast("long"), F.col("h"))).alias("new_h"))
    )


def _fold(bins):
    return F.aggregate(
        bins,
        F.struct(
            F.lit(0).cast("long").alias("s"), F.lit(0).cast("long").alias("best")
        ),
        lambda acc, x: F.struct(
            (acc["s"] + x["c"]).alias("s"),
            F.greatest(acc["best"], F.least(x["hc"], acc["s"] + x["c"])).alias(
                "best"
            ),
        ),
        lambda acc: acc["best"],
    )


def _hist2x_hh(msgs, b):
    cnts = msgs.groupBy("dst", "h").agg(F.count("*").alias("c"))
    hist = cnts.groupBy("dst").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("h").alias("hc"), "c")), asc=False
        ).alias("bins")
    )
    return hist.select("dst", _fold("bins").alias("new_h"))


def main() -> None:
    from graftlink.gen import synthetic_edges
    from graftlink.session import get_spark

    spark = get_spark("ab-coreness", cores=CPUS, shuffle_partitions=max(CPUS, 8))
    e = synthetic_edges(spark, N_VERTICES, N_EDGES, seed=42).persist()
    e.count()

    kernels = {
        "window_r2": lambda: _loop(e, _window_hh),
        "hist2x_r3": lambda: _loop(e, _hist2x_hh, clip=True),
        "fused_u1": lambda: core_numbers(e, unroll=1),
        "fused_u2": lambda: core_numbers(e, unroll=2),
    }
    walls: dict[str, list[float]] = {k: [] for k in kernels}
    baseline = None
    for rep in range(REPS):
        for name, fn in kernels.items():
            t0 = time.monotonic()
            res = fn().orderBy("id")
            rows = [(r["id"], r["core"]) for r in res.collect()]
            wall = round(time.monotonic() - t0, 2)
            walls[name].append(wall)
            if baseline is None:
                baseline = rows
            elif rows != baseline:
                print(f"MISMATCH: {name} rep {rep} disagrees", flush=True)
                sys.exit(1)
            print(f"rep{rep} {name}: {wall}s", file=sys.stderr, flush=True)
    out = {
        "graph": {"v": N_VERTICES, "e": N_EDGES},
        "reps": REPS,
        "walls": walls,
        "medians": {k: statistics.median(v) for k, v in walls.items()},
        "all_agree": True,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
