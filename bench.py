"""Bench harness (BASELINE.md rows 1-3).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "sec", "queries": {...}, "sf": ...}

Headline queries run on:
- a deterministic synthetic power-law graph (seed 42; no external
  data) at the sandbox design point — BASELINE.md row 1's stand-in
  for the 10^9-edge sample;
- the driver testdata at $SPARK_GRAFT_SF_DIR for the documents
  stand-in pipeline.

Scaling evidence (row 3): the same PageRank superstep job at
local[8] and local[32] on identical input; efficiency =
(edges/s @32) / (4 x edges/s @8). Written to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_VERTICES = int(os.environ.get("GRAFTLINK_BENCH_VERTICES", "200000"))
N_EDGES = int(os.environ.get("GRAFTLINK_BENCH_EDGES", "2000000"))
PR_FIXED_ITERS = 5


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _session(cores: int):
    from graftlink.session import get_spark

    return get_spark(f"graftlink-bench-{cores}", cores=cores,
                     shuffle_partitions=max(cores, 8))


def _graph(spark):
    from graftlink.gen import synthetic_edges

    e = synthetic_edges(spark, N_VERTICES, N_EDGES, seed=42).persist()
    e.count()  # materialize outside the timers
    return e


def pagerank_fixed(spark, edges) -> float:
    from graftlink.pagerank import pagerank

    t0 = time.monotonic()
    pagerank(edges, tol=0.0, max_iter=PR_FIXED_ITERS,
             checkpoint_mode="local").count()
    return time.monotonic() - t0


def run_scaling() -> dict:
    out = {}
    for cores in (8, CPUS):
        spark = _session(cores)
        edges = _graph(spark)
        wall = pagerank_fixed(spark, edges)
        eps = PR_FIXED_ITERS * N_EDGES / wall
        out[f"local[{cores}]"] = {"wall_s": round(wall, 2),
                                  "edges_per_sec": round(eps)}
        log(f"scaling local[{cores}]: {wall:.1f}s  {eps:,.0f} edges/s")
        edges.unpersist()
        spark.stop()
    lo = out["local[8]"]["edges_per_sec"]
    hi = out[f"local[{CPUS}]"]["edges_per_sec"]
    out["efficiency"] = round(hi / (CPUS / 8 * lo), 3)
    return out


def main():
    queries: dict[str, float] = {}
    t_all = time.monotonic()

    scaling = run_scaling()

    spark = _session(CPUS)
    edges = _graph(spark)

    from graftlink.components import connected_components
    from graftlink.docs_graph import clean_edges, doc_edges
    from graftlink.lpa import label_propagation
    from graftlink.pagerank import pagerank
    from graftlink.triangles import triangle_count
    from graftlink.vertices import degrees
    from pyspark.sql import functions as F

    # q1: PageRank fixed supersteps (throughput headline)
    wall = pagerank_fixed(spark, edges)
    queries["pagerank_5it"] = round(wall, 2)
    superstep_eps = PR_FIXED_ITERS * N_EDGES / wall
    log(f"pagerank_5it {wall:.1f}s ({superstep_eps:,.0f} edges/s/superstep)")

    # q2: PageRank to convergence (1e-6) — iterations + wall
    stats: dict = {}
    t0 = time.monotonic()
    pagerank(edges, tol=1e-6, max_iter=60, checkpoint_mode="local",
             stats=stats).count()
    queries["pagerank_converge_1e6"] = round(time.monotonic() - t0, 2)
    log(f"pagerank converge: {stats.get('iterations')} iters "
        f"{queries['pagerank_converge_1e6']}s")

    # q3: connected components (large-star/small-star)
    t0 = time.monotonic()
    n_comp = (
        connected_components(edges, algo="star")
        .agg(F.max("component")).collect()[0][0]
    )
    queries["components_star"] = round(time.monotonic() - t0, 2)
    log(f"components: {n_comp + 1} comps {queries['components_star']}s")

    # q4: LPA fixed supersteps
    t0 = time.monotonic()
    label_propagation(edges, max_iter=5, checkpoint_mode="local").count()
    queries["lpa_5it"] = round(time.monotonic() - t0, 2)
    log(f"lpa_5it {queries['lpa_5it']}s")

    # q5: triangle count
    t0 = time.monotonic()
    ntri = triangle_count(edges)
    queries["triangles"] = round(time.monotonic() - t0, 2)
    log(f"triangles: {ntri} in {queries['triangles']}s")

    # q6: documents stand-in pipeline on the driver testdata
    t0 = time.monotonic()
    de = clean_edges(doc_edges(spark, SF_DIR))
    degrees(de, "in").orderBy(F.col("degree").desc(), F.col("id").asc()).limit(
        20
    ).collect()
    queries["docs_pipeline"] = round(time.monotonic() - t0, 2)

    edges.unpersist()

    # write BENCH/BASELINE.md
    os.makedirs("BENCH", exist_ok=True)
    iters = stats.get("iterations")
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — measured numbers (sandbox, 32 cores / 125 GB, "
            "local-mode stand-in for multi-executor)\n\n"
            f"Synthetic power-law graph: n={N_VERTICES:,} vertices, "
            f"m={N_EDGES:,} edges, seed 42 (graftlink/gen.py).\n\n"
            "| metric | value | config |\n| --- | --- | --- |\n"
            f"| superstep throughput | {superstep_eps:,.0f} edges/s/superstep "
            f"| PageRank, {PR_FIXED_ITERS} supersteps, local[{CPUS}] |\n"
            f"| PageRank to L-inf<1e-6 | {queries['pagerank_converge_1e6']} s "
            f"({iters} iterations) | damping 0.85, local[{CPUS}] |\n"
            f"| CC (large-star/small-star) | {queries['components_star']} s "
            f"| local[{CPUS}] |\n"
            f"| LPA 5 supersteps | {queries['lpa_5it']} s | local[{CPUS}] |\n"
            f"| triangle count | {queries['triangles']} s ({ntri:,} triangles) "
            f"| local[{CPUS}] |\n\n"
            "## Scaling (N vs 4N parallelism — BASELINE.md row 3)\n\n"
            "| level | wall_s | edges/sec |\n| --- | --- | --- |\n"
            f"| local[8] | {scaling['local[8]']['wall_s']} "
            f"| {scaling['local[8]']['edges_per_sec']:,} |\n"
            f"| local[{CPUS}] | {scaling[f'local[{CPUS}]']['wall_s']} "
            f"| {scaling[f'local[{CPUS}]']['edges_per_sec']:,} |\n\n"
            f"**Scaling efficiency: {scaling['efficiency']}** "
            "(= edges/s@4N / (4 x edges/s@N); target >= 0.8)\n"
        )

    log(f"total bench wall: {time.monotonic()-t_all:.0f}s")
    print(json.dumps({
        "metric": "pagerank_superstep_edges_per_sec",
        "value": round(superstep_eps),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "graph": {"n_vertices": N_VERTICES, "n_edges": N_EDGES},
        "pagerank_iterations_to_1e6": iters,
        "scaling": scaling,
    }))


if __name__ == "__main__":
    main()
