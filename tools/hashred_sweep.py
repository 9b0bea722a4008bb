"""Stability sweep for the four r4 driver hash-red queries (round-4
verdict task #2): run each query across a grid of cores x shuffle
partitions x AQE, canonicalize exactly like tools/driver_check.py,
and diff the canon STRINGS — not just hashes — against the DuckDB
oracle. Writes hashred_sweep_r5.json.

Root cause (found first, this sweep is the order-sensitivity
counter-proof): the four twins emitted DuckDB HUGEINT sum columns
(pandas float64) against Spark int64 — a dtype divergence invisible
to the %.6g canon here but fatal to any dtype-sensitive driver
formatting. tools/driver_check.py's canon was ALWAYS green locally;
this sweep documents that the Spark-side canon string is bitwise
IDENTICAL across every tested config, so no order sensitivity
exists on top of the dtype defect.

Usage: python tools/hashred_sweep.py [out.json]
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.driver_check import TABLES, canon_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
QUERIES = [
    "host_link_stats", "voronoi_communities", "user_sessions",
    "graph_predicates",
]
GRID = [
    # (cores, shuffle_partitions, aqe)
    (4, 8, True), (4, 8, False), (4, 200, True),
    (8, 8, True), (8, 8, False), (8, 200, True), (8, 200, False),
    (32, 8, True), (32, 200, True), (32, 200, False),
    (32, 32, True), (32, 32, False),
]
REPEATS = 2  # 12 configs x 2 = 24 runs per query (>= the asked 20)


def canon_string(pdf) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols).reset_index(drop=True)
    fmt_rows = []
    for row in pdf.itertuples(index=False):
        vals = []
        for v in row:
            vals.append(f"{v:.6g}" if isinstance(v, float) else str(v))
        fmt_rows.append("\x1f".join(vals))
    return "\x1e".join(fmt_rows)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "hashred_sweep_r5.json"
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_canon = {
        name: canon_string(con.execute(E.oracle_sql()[name]).df())
        for name in QUERIES
    }

    results = {name: {"oracle_hash": hashlib.sha256(
        oracle_canon[name].encode()).hexdigest()[:16], "runs": []}
        for name in QUERIES}
    from pyspark.sql import SparkSession

    for cores, parts, aqe in GRID:
        spark = (
            SparkSession.builder.master(f"local[{cores}]")
            .appName(f"hashred-{cores}-{parts}-{aqe}")
            .config("spark.sql.shuffle.partitions", str(parts))
            .config("spark.sql.adaptive.enabled", str(aqe).lower())
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
        try:
            for rep in range(REPEATS):
                for name in QUERIES:
                    pdf = E.queries()[name](spark, SF_DIR).toPandas()
                    cs = canon_string(pdf)
                    results[name]["runs"].append({
                        "cores": cores, "parts": parts, "aqe": aqe,
                        "rep": rep,
                        "hash": hashlib.sha256(cs.encode()).hexdigest()[:16],
                        "matches_oracle": cs == oracle_canon[name],
                    })
                    if cs != oracle_canon[name]:
                        # first divergent cell, for the record
                        sl = cs.split("\x1e")
                        ol = oracle_canon[name].split("\x1e")
                        diff = next(
                            (i, a, b) for i, (a, b) in enumerate(zip(sl, ol))
                            if a != b
                        )
                        results[name]["runs"][-1]["first_diff_row"] = diff
        finally:
            spark.stop()

    for name in QUERIES:
        runs = results[name]["runs"]
        results[name]["n_runs"] = len(runs)
        results[name]["distinct_spark_hashes"] = len({r["hash"] for r in runs})
        results[name]["all_match_oracle"] = all(r["matches_oracle"] for r in runs)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    summary = {
        n: {
            "n_runs": results[n]["n_runs"],
            "distinct_spark_hashes": results[n]["distinct_spark_hashes"],
            "all_match_oracle": results[n]["all_match_oracle"],
        }
        for n in QUERIES
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
