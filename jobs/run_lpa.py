"""spark-submit entry point: label propagation communities."""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges")
    ap.add_argument("--synthetic")
    ap.add_argument("--max-iter", type=int, default=30)
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--output")
    args = ap.parse_args()

    from graftlink.gen import synthetic_edges
    from graftlink.lpa import label_propagation
    from graftlink.session import get_spark

    spark = get_spark("graftlink-lpa")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)

    stats: dict = {}
    t0 = time.monotonic()
    comm = label_propagation(
        edges, max_iter=args.max_iter, checkpoint_dir=args.checkpoint_dir,
        resume=args.resume, stats=stats,
    )
    if args.output:
        comm.write.mode("overwrite").parquet(args.output)
        n_comm = spark.read.parquet(args.output).select("community").distinct().count()
    else:
        n_comm = comm.select("community").distinct().count()
    print(json.dumps({"job": "lpa", "n_communities": int(n_comm), **stats,
                      "wall_s": round(time.monotonic() - t0, 2)}))


if __name__ == "__main__":
    main()
