"""spark-submit entry point: path family (multi-source BFS, weighted
SSSP, k-source betweenness).

    spark-submit --master local[8] --py-files graftlink.zip \
        jobs/run_paths.py --algo msbfs --synthetic 20000,100000 \
        --sources 0,1,2,3 --checkpoint-dir /chk --resume
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
    ap.add_argument("--algo", choices=["msbfs", "sssp", "betweenness"],
                    required=True)
    ap.add_argument("--edges")
    ap.add_argument("--synthetic")
    ap.add_argument("--sources", default="0")
    ap.add_argument("--weight-col", default="weight")
    ap.add_argument("--max-depth", type=int, default=100)
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--output")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graftlink.gen import synthetic_edges
    from graftlink.paths import (
        betweenness_from_sources,
        multi_source_bfs,
        sssp_weighted,
    )
    from graftlink.session import get_spark

    spark = get_spark(f"graftlink-{args.algo}")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)
    sources = [int(s) for s in args.sources.split(",")]

    t0 = time.monotonic()
    if args.algo == "msbfs":
        out = multi_source_bfs(
            edges, sources, max_depth=args.max_depth,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        )
        stat = out.agg(F.max("dist").alias("s")).collect()[0]["s"]
    elif args.algo == "sssp":
        if args.weight_col not in edges.columns:
            edges = edges.withColumn(
                args.weight_col,
                (F.pmod(F.xxhash64("src", "dst"), F.lit(9)) + 1).cast("double"),
            )
        out = sssp_weighted(
            edges, sources[0], weight_col=args.weight_col,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        )
        stat = out.agg(F.max("dist").alias("s")).collect()[0]["s"]
    else:
        out = betweenness_from_sources(
            edges, sources, max_depth=args.max_depth
        )
        stat = out.agg(F.max("betweenness").alias("s")).collect()[0]["s"]
    rows = out.count()
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({
        "job": args.algo, "rows": rows, "max_stat": float(stat),
        "sources": len(sources),
        "wall_s": round(time.monotonic() - t0, 2),
    }))


if __name__ == "__main__":
    main()
