"""spark-submit entry point: cc-webgraph-style host/domain rollups
over a url-edge parquet (or pages parquet, or the deterministic
synthetic fixture), then host PageRank and host harmonic centrality.

    spark-submit --py-files graftlink.zip jobs/run_hostgraph.py \
        --url-edges /path/url_edges.parquet --output /out

    spark-submit ... jobs/run_hostgraph.py --pages /path/pages.parquet
    spark-submit ... jobs/run_hostgraph.py --synthetic 100000,1000000

--pages runs the full pipeline from raw pages: latest-snapshot dedup
-> href extraction -> url edges -> rollup. --synthetic derives url
edges from the seeded power-law graph via the deterministic fixture
url map (graftlink.hostgraph._fixture_url).
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
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--url-edges", help="parquet with src_url,dst_url")
    src.add_argument("--pages", help="pages parquet (url,warc_ts,html,...)")
    src.add_argument("--synthetic", help="n_vertices,n_edges fixture graph")
    ap.add_argument("--level", choices=["host", "domain"], default="host")
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--skip-harmonic", action="store_true")
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--output", help="writes <output>/{edges,pagerank,harmonic}")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graftlink.hostgraph import (
        _fixture_url,
        domain_edges,
        host_edges,
        host_harmonic,
        host_pagerank,
    )
    from graftlink.session import get_spark

    spark = get_spark("graftlink-hostgraph")
    t0 = time.monotonic()
    if args.synthetic:
        from graftlink.gen import synthetic_edges

        n, m = (int(x) for x in args.synthetic.split(","))
        ue = synthetic_edges(spark, n, m).select(
            _fixture_url(F.col("src")).alias("src_url"),
            _fixture_url(F.col("dst")).alias("dst_url"),
        )
    elif args.pages:
        from graftlink.extract import extract_edges
        from graftlink.sources import read_pages

        ue = extract_edges(read_pages(spark, args.pages))
    else:
        ue = spark.read.parquet(args.url_edges)

    rollup = domain_edges(ue) if args.level == "domain" else host_edges(ue)
    n_pairs = rollup.count()

    pr_kw = {}
    if args.checkpoint_dir:
        pr_kw = {"checkpoint_dir": args.checkpoint_dir}
    # level flows into the rank path too: with --level domain the
    # centralities are computed on the DOMAIN contraction, not merely
    # labeled so (round-4 advisor finding)
    ranks = host_pagerank(
        ue, max_iter=args.max_iter, tol=args.tol, level=args.level, **pr_kw
    )
    top = ranks.orderBy(F.col("rank").desc(), F.col("host").asc()).limit(10).collect()

    harm_rows = 0
    if not args.skip_harmonic:
        harm = host_harmonic(ue, level=args.level)
        harm_rows = harm.count()
        if args.output:
            harm.write.mode("overwrite").parquet(f"{args.output}/harmonic")

    if args.output:
        rollup.write.mode("overwrite").parquet(f"{args.output}/edges")
        ranks.write.mode("overwrite").parquet(f"{args.output}/pagerank")

    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "job": "hostgraph",
                "level": args.level,
                "rollup_pairs": n_pairs,
                ("top_domain" if args.level == "domain" else "top_host"):
                    top[0]["host"] if top else None,
                "harmonic_rows": harm_rows,
                "wall_s": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
