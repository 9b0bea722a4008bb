"""spark-submit entry point: strongly connected components."""

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
    ap.add_argument("--output")
    args = ap.parse_args()

    from graftlink.gen import synthetic_edges
    from graftlink.scc import strongly_connected_components
    from graftlink.session import get_spark

    spark = get_spark("graftlink-scc")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)

    t0 = time.monotonic()
    comp = strongly_connected_components(edges)
    if args.output:
        comp.write.mode("overwrite").parquet(args.output)
        n_comp = spark.read.parquet(args.output).agg({"component": "max"}).collect()[0][0] + 1
    else:
        n_comp = comp.agg({"component": "max"}).collect()[0][0] + 1
    print(json.dumps({"job": "scc", "n_components": int(n_comp),
                      "wall_s": round(time.monotonic() - t0, 2)}))


if __name__ == "__main__":
    main()
