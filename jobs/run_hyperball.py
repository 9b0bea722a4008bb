"""spark-submit entry point: HyperBall sketch family — per-vertex
ball-size estimates, the ANF trace / effective diameter, and harmonic
centrality, all from one HLL superstep loop. Checkpoint/resume flags
follow the north-rule contract (same as run_pagerank): per-superstep
durable register state + lineage fingerprint, so a killed run resumes
mid-algorithm bit-exactly (registers are integers)."""

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
        choices=["balls", "anf", "diameter", "harmonic", "closeness"],
        default="anf",
    )
    ap.add_argument("--order", type=int, default=8)
    ap.add_argument("--log2m", type=int, default=4)
    ap.add_argument("--mode", choices=["out", "in", "all"], default="out")
    ap.add_argument("--engine", choices=["jvm", "arrow"], default="jvm")
    ap.add_argument("--q", type=float, default=0.9)
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--output")
    args = ap.parse_args()

    from graftlink.checkpoint import fingerprint_edges
    from graftlink.gen import synthetic_edges
    from graftlink.hyperball import (
        effective_diameter,
        hyperball,
        neighborhood_function,
    )
    from graftlink.session import get_spark

    spark = get_spark(f"graftlink-hyperball-{args.algo}")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)
    fp = fingerprint_edges(edges) if args.checkpoint_dir else ""

    t0 = time.monotonic()
    summary: dict = {"job": f"hyperball-{args.algo}", "order": args.order,
                     "m": 1 << args.log2m, "mode": args.mode}
    stats: dict = {}
    if args.algo == "balls":
        res = hyperball(
            edges, order=args.order, log2m=args.log2m, mode=args.mode,
            engine=args.engine, checkpoint_dir=args.checkpoint_dir,
            resume=args.resume, fingerprint=fp, stats=stats,
        )
        summary["rows"] = res.count()
    elif args.algo == "anf":
        res = neighborhood_function(
            edges, order=args.order, log2m=args.log2m, mode=args.mode,
            engine=args.engine,
        )
        summary["nf"] = {
            int(r["t"]): r["nf"] for r in res.orderBy("t").collect()
        }
    elif args.algo == "diameter":
        res = effective_diameter(
            edges, q=args.q, order=args.order, log2m=args.log2m,
            mode=args.mode, engine=args.engine,
        )
        summary["effective_diameter"] = res.collect()[0]["effective_diameter"]
    elif args.algo == "closeness":
        res = hyperball(
            edges, order=args.order, log2m=args.log2m, mode=args.mode,
            closeness=True, engine=args.engine,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            fingerprint=fp, stats=stats,
        )
        summary["rows"] = res.count()
    else:
        summary["mode"] = "in"  # harmonic counts vertices that REACH v
        res = hyperball(
            edges, order=args.order, log2m=args.log2m, mode="in",
            harmonic=True, engine=args.engine,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            fingerprint=fp, stats=stats,
        )
        summary["rows"] = res.count()

    if args.output:
        res.write.mode("overwrite").parquet(args.output)
    summary.update({k: v for k, v in stats.items() if k != "trace"})
    summary["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
