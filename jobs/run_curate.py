"""spark-submit entry point: end-to-end corpus curation (quality
filter -> exact dedup -> near-dup drop -> per-domain cap -> splits),
writing the curated id/source/split table to parquet."""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", help="parquet with doc_id/text/source/n_chars")
    ap.add_argument("--sf-dir", help="driver testdata dir (documents.parquet)")
    ap.add_argument("--quality-min", type=float, default=0.4)
    ap.add_argument("--near-dup-threshold", type=float, default=0.5)
    ap.add_argument("--domain-cap", type=int, default=20)
    ap.add_argument("--hash-mode", choices=["portable", "fast"], default="fast")
    ap.add_argument("--output")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graftlink.corpus import curate
    from graftlink.session import get_spark

    spark = get_spark("graftlink-curate")
    path = args.documents or f"{args.sf_dir or '/root/testdata/sf0.01'}/documents.parquet"
    docs = spark.read.parquet(path)

    t0 = time.monotonic()
    out = curate(
        docs,
        quality_min=args.quality_min,
        near_dup_threshold=args.near_dup_threshold,
        domain_cap=args.domain_cap,
        hash_mode=args.hash_mode,
    )
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
    splits = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n_in = docs.count()
    print(json.dumps({
        "job": "curate",
        "docs_in": n_in,
        "docs_out": sum(splits.values()),
        "splits": splits,
        "wall_s": round(time.monotonic() - t0, 2),
    }))


if __name__ == "__main__":
    main()
