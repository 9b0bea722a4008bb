"""spark-submit entry point: batch personalized PageRank (forward
push) over an edge parquet or the deterministic synthetic graph.

    spark-submit --py-files graftlink.zip jobs/run_ppr.py \
        --edges /path/edges.parquet --seeds 0,7,42 --output /out

    spark-submit ... jobs/run_ppr.py --synthetic 1000000,10000000 \
        --seeds 0,1,2,3 --rounds 8
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
    ap.add_argument("--seeds", default="0", help="comma-separated seed ids")
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--fast", action="store_true",
                    help="partial-agg residual sums (production fp path)")
    ap.add_argument("--output")
    args = ap.parse_args()

    from graftlink.ppr import ppr_push
    from graftlink.session import get_spark

    spark = get_spark("graftlink-ppr")
    if args.synthetic:
        from graftlink.gen import synthetic_edges

        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)
    seeds = [int(s) for s in args.seeds.split(",")]

    t0 = time.monotonic()
    res = ppr_push(
        edges, seeds, alpha=args.alpha, rounds=args.rounds,
        ordered=not args.fast,
    )
    if args.output:
        res.write.mode("overwrite").parquet(args.output)
        n_rows = spark.read.parquet(args.output).count()
    else:
        n_rows = res.count()
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "job": "ppr_push",
                "seeds": len(seeds),
                "rounds": args.rounds,
                "rows": n_rows,
                "wall_s": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
