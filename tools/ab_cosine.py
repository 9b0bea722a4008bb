"""A/B harness for cosine_topk_arrow (round-4 verdict "Next round" #2).

Round 3 recorded 2.23 s for the 8-query Arrow-matmul cosine top-k at
sf0.1 vs 0.65/0.68 s in rounds 2/1, with an UNCHANGED kernel — the
suspects are bench-session drift (the r3 bench runs ~8,300 stages
before this query vs ~1,600 in r2) and Arrow batch sizing.  This
harness isolates both:

  * every measurement runs in its OWN fresh JVM (subprocess child),
    eliminating accumulated executor/driver state;
  * configs are interleaved (a full cycle of all configs, repeated),
    so box drift hits every config equally;
  * one config varies spark.sql.execution.arrow.maxRecordsPerBatch.

Usage:
  python tools/ab_cosine.py            # parent: interleave, write JSON
  python tools/ab_cosine.py child <mode> <batch>   # one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = 3
CONFIGS = [
    ("arrow", "10000"),   # kernel + Spark's default Arrow batch
    ("arrow", "65536"),   # bigger batches -> fewer matmuls / IPC round-trips
    ("expr", "10000"),    # JVM higher-order-function path, same contract
]


def child(mode: str, batch: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from graftlink.similarity import cosine_topk, cosine_topk_arrow

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    n = emb.count()
    # exactly the bench.py measurement protocol: qid fetch inside t0
    t0 = time.monotonic()
    qids = [r[0] for r in emb.select("vec_id").limit(8).collect()]
    fn = cosine_topk_arrow if mode == "arrow" else cosine_topk
    rows = fn(emb, qids, k=10).count()
    wall = time.monotonic() - t0
    print(json.dumps({"mode": mode, "batch": batch, "n": n,
                      "rows": rows, "wall": round(wall, 3)}))


def parent() -> None:
    runs: list[dict] = []
    for rep in range(REPS):
        for mode, batch in CONFIGS:
            out = subprocess.run(
                [sys.executable, __file__, "child", mode, batch],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            rec["rep"] = rep
            runs.append(rec)
            print(rec, flush=True)
    med = {}
    for mode, batch in CONFIGS:
        walls = sorted(r["wall"] for r in runs
                       if r["mode"] == mode and r["batch"] == batch)
        med[f"{mode}@{batch}"] = walls[len(walls) // 2]
    result = {"sf_dir": SF_DIR, "cpus": CPUS, "reps": REPS,
              "runs": runs, "medians": med}
    with open("ab_cosine_r4.json", "w") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(med))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], sys.argv[3])
    else:
        parent()
