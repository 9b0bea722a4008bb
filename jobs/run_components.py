"""spark-submit entry point: connected components (star|minlabel)."""

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
    ap.add_argument(
        "--format", default="parquet",
        choices=["parquet", "edgelist", "ncol", "graphml", "gml"],
        help="--edges file format: parquet, igraph integer edgelist, "
             "ncol (string names; dense ids assigned), or the "
             "GraphML/GML interchange readers (driver-side parse, "
             "dense ids assigned)",
    )
    ap.add_argument("--synthetic")
    ap.add_argument("--algo", default="star", choices=["star", "minlabel"])
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--output")
    args = ap.parse_args()

    from graftlink.components import connected_components
    from graftlink.gen import synthetic_edges
    from graftlink.session import get_spark

    spark = get_spark("graftlink-components")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    elif args.format == "edgelist":
        from graftlink.sources import read_edgelist

        edges = read_edgelist(spark, args.edges)
    elif args.format == "ncol":
        from graftlink.sources import read_ncol

        edges, _names = read_ncol(spark, args.edges)
    elif args.format == "graphml":
        from graftlink.graphml import read_graphml

        edges, _names, _directed = read_graphml(spark, args.edges)
    elif args.format == "gml":
        from graftlink.graphml import read_gml

        edges, _names, _directed = read_gml(spark, args.edges)
    else:
        edges = spark.read.parquet(args.edges)

    t0 = time.monotonic()
    comp = connected_components(
        edges, algo=args.algo, checkpoint_dir=args.checkpoint_dir, resume=args.resume
    )
    if args.output:
        comp.write.mode("overwrite").parquet(args.output)
        n_comp = spark.read.parquet(args.output).agg({"component": "max"}).collect()[0][0] + 1
    else:
        n_comp = comp.agg({"component": "max"}).collect()[0][0] + 1
    print(json.dumps({"job": "components", "algo": args.algo,
                      "n_components": int(n_comp),
                      "wall_s": round(time.monotonic() - t0, 2)}))


if __name__ == "__main__":
    main()
