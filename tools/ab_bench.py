"""Single-query bench probe for clean A/B medians.

One fresh process = one measurement (shared-JVM session reuse between
SparkSessions pollutes results on this box, and wall times vary ~2x
run to run — BENCH/BASELINE.md honesty note). Interleave runs of the
variants under comparison and take per-variant medians:

    for i in 1 2 3; do
      for q in components_star pagerank_converge lpa_5it; do
        python tools/ab_bench.py $q
      done
    done

Prints one JSON line {"query": ..., "wall_s": ...} per run; the same
seed-42 power-law graph (n=200k, m=2e6) as bench.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_VERTICES = 200_000
N_EDGES = 2_000_000


def main():
    query = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from graftlink.gen import synthetic_edges
    from graftlink.session import get_spark

    spark = get_spark(f"ab-{query}", cores=cores, shuffle_partitions=max(cores, 8))
    edges = synthetic_edges(spark, N_VERTICES, N_EDGES, seed=42).persist()
    edges.count()

    t0 = time.monotonic()
    if query == "components_star":
        from graftlink.components import connected_components

        connected_components(edges, algo="star").agg(F.max("component")).collect()
    elif query == "pagerank_converge":
        from graftlink.pagerank import pagerank

        pagerank(edges, tol=1e-6, max_iter=60, checkpoint_mode="local").count()
    elif query == "lpa_5it":
        from graftlink.lpa import label_propagation

        label_propagation(edges, max_iter=5, checkpoint_mode="local").count()
    elif query == "core_numbers":
        from graftlink.kcore import core_numbers

        core_numbers(edges).agg(F.max("core")).collect()
    elif query == "scc":
        from graftlink.scc import strongly_connected_components

        strongly_connected_components(edges).agg(F.max("component")).collect()
    elif query == "betweenness":
        from graftlink.paths import betweenness_from_sources

        betweenness_from_sources(edges, sources=list(range(8))).count()
    elif query == "multi_source_bfs":
        from graftlink.paths import multi_source_bfs

        multi_source_bfs(edges, sources=list(range(8))).count()
    elif query == "louvain":
        from graftlink.louvain import louvain_communities

        louvain_communities(edges).agg(F.max("community")).collect()
    else:
        raise SystemExit(f"unknown query: {query}")
    wall = time.monotonic() - t0
    print(json.dumps({"query": query, "wall_s": round(wall, 2), "cores": cores}))
    spark.stop()


if __name__ == "__main__":
    main()
