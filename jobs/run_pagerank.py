"""spark-submit entry point: PageRank over an edge parquet (or the
deterministic synthetic graph).

    spark-submit --py-files graftlink.zip jobs/run_pagerank.py \
        --edges /path/edges.parquet --checkpoint-dir /chk --output /out

    spark-submit ... jobs/run_pagerank.py --synthetic 1000000,10000000

On a cluster the master/executors come from spark-submit; locally the
SPARK_GRAFT_CPUS env selects local[N] (the N vs 4N scaling evidence
path, BASELINE.md row 3).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", help="parquet path with src,dst")
    ap.add_argument("--synthetic", help="n_vertices,n_edges deterministic graph")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--output")
    args = ap.parse_args()

    from graftlink.checkpoint import fingerprint_edges
    from graftlink.gen import synthetic_edges
    from graftlink.pagerank import pagerank
    from graftlink.session import get_spark

    spark = get_spark("graftlink-pagerank")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)

    stats: dict = {}
    t0 = time.monotonic()
    fp = fingerprint_edges(edges) if args.checkpoint_dir else ""
    ranks = pagerank(
        edges,
        damping=args.damping,
        tol=args.tol,
        max_iter=args.max_iter,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        fingerprint=fp,
        stats=stats,
    )
    if args.output:
        ranks.write.mode("overwrite").parquet(args.output)
    else:
        ranks.orderBy(ranks.rank.desc()).show(10)
    wall = time.monotonic() - t0
    stats["wall_s"] = round(wall, 2)
    stats["edges_per_sec"] = (
        round(stats["edges_processed"] / wall) if stats.get("edges_processed") else 0
    )
    print(json.dumps({"job": "pagerank", **stats}))


if __name__ == "__main__":
    main()
