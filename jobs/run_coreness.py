"""spark-submit entry point: k-core decomposition (h-index propagation)."""

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
    from graftlink.kcore import core_numbers
    from graftlink.session import get_spark

    spark = get_spark("graftlink-coreness")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)

    t0 = time.monotonic()
    cores = core_numbers(edges)
    if args.output:
        cores.write.mode("overwrite").parquet(args.output)
        kmax = spark.read.parquet(args.output).agg({"core": "max"}).collect()[0][0]
    else:
        kmax = cores.agg({"core": "max"}).collect()[0][0]
    print(json.dumps({"job": "coreness", "k_max": int(kmax),
                      "wall_s": round(time.monotonic() - t0, 2)}))


if __name__ == "__main__":
    main()
