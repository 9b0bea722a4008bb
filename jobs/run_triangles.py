"""spark-submit entry point: triangle counting."""

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
    ap.add_argument("--per-vertex-output")
    args = ap.parse_args()

    from graftlink.gen import synthetic_edges
    from graftlink.session import get_spark
    from graftlink.triangles import triangle_count, triangles_per_vertex

    spark = get_spark("graftlink-triangles")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)

    t0 = time.monotonic()
    total = triangle_count(edges)
    out = {"job": "triangles", "n_triangles": int(total),
           "wall_s": round(time.monotonic() - t0, 2)}
    if args.per_vertex_output:
        triangles_per_vertex(edges).write.mode("overwrite").parquet(
            args.per_vertex_output
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
