"""spark-submit entry point: structural family — MIS, greedy
coloring, triad census, seeded random walks. Checkpoint/resume flags
follow the north-rule contract (same as run_pagerank)."""

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
    ap.add_argument(
        "--algo",
        choices=["mis", "coloring", "triads", "walks"],
        default="mis",
    )
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-rounds", type=int, default=64)
    ap.add_argument("--walkers", type=int, default=1000)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--output")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graftlink.checkpoint import fingerprint_edges
    from graftlink.gen import synthetic_edges
    from graftlink.session import get_spark

    spark = get_spark(f"graftlink-{args.algo}")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)
    fp = fingerprint_edges(edges) if args.checkpoint_dir else ""

    t0 = time.monotonic()
    summary: dict = {"job": args.algo}
    if args.algo == "mis":
        from graftlink.mis import maximal_independent_set

        res = maximal_independent_set(
            edges, max_rounds=args.max_rounds,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            fingerprint=fp,
        )
        out_cols = res
        summary["mis_size"] = int(
            res.agg(F.sum(F.col("in_mis").cast("long"))).collect()[0][0]
        )
    elif args.algo == "coloring":
        from graftlink.mis import greedy_coloring

        res = greedy_coloring(
            edges, max_rounds=max(args.max_rounds, 200),
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            fingerprint=fp,
        )
        out_cols = res
        summary["n_colors"] = int(res.agg(F.max("color")).collect()[0][0]) + 1
    elif args.algo == "triads":
        from graftlink.triads import triad_census

        res = triad_census(edges)
        out_cols = res
        row = res.collect()[0]
        summary["census"] = row.asDict()
    else:
        from graftlink.walks import random_walks

        res = random_walks(edges, list(range(args.walkers)), args.steps)
        out_cols = res
        summary["walk_rows"] = res.count()

    if args.output:
        out_cols.write.mode("overwrite").parquet(args.output)
    summary["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
