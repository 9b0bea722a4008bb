"""Simulate the driver's verify pass: entry() smoke + queries() vs
oracle_sql() DuckDB compare (row count, schema, order-insensitive
value hash), like CORRECTNESS_r{N}.json.

Canonicalization deliberately goes through PANDAS on both sides
(spark .toPandas(), duckdb .df()) because that is what the real
driver does — it is what surfaces the two failure classes round 1
missed locally: array columns that pandas sort_values cannot order
("unhashable type: 'list'") and DuckDB HUGEINT sums arriving as
float64 (19525.0 vs 19525).

Usage: python tools/driver_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_hash(pdf) -> str:
    """Order-insensitive hash via the driver's pandas path: sort
    columns by name, sort rows by all columns (raises on unsortable
    cells, as the driver does), format floats %.6g."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols).reset_index(drop=True)
    fmt_rows = []
    for row in pdf.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        fmt_rows.append("\x1f".join(vals))
    return hashlib.sha256("\x1e".join(fmt_rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from graftlink.session import get_spark

    spark = get_spark("driver-check", cores=8, shuffle_partitions=8)

    if not only:
        t0 = time.monotonic()
        flagship = entry_mod.entry(spark)
        rows = flagship.collect()
        print(f"entry(): {len(rows)} rows in {time.monotonic()-t0:.1f}s "
              f"schema={[f.name for f in flagship.schema.fields]}")
        assert len(rows) >= 0
        for r in rows[:3]:
            print("   ", r)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    results: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:
            print(f"  {name}: SPARK ERROR {exc}")
            failures.append(name)
            results[name] = {"err": f"spark: {exc}"}
            continue
        elapsed = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name}: rows-only {len(spdf)} rows ({elapsed:.1f}s)")
            results[name] = {
                "rows_only": True, "spark_rows": len(spdf), "err": None,
                "secs": round(elapsed, 1),
            }
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"  {name}: ORACLE ERROR {exc}")
            failures.append(name)
            results[name] = {"err": f"oracle: {exc}"}
            continue
        ok_count = len(spdf) == len(opdf)
        ok_schema = sorted(spdf.columns) == sorted(opdf.columns)
        try:
            sh, oh = canon_hash(spdf), canon_hash(opdf)
            ok_hash = sh == oh
        except Exception as exc:
            print(f"  {name}: CANON ERROR {exc}")
            failures.append(name)
            results[name] = {"err": f"canon: {exc}"}
            continue
        status = "OK" if (ok_count and ok_schema and ok_hash) else "FAIL"
        print(f"  {name}: {status} rows {len(spdf)}/{len(opdf)} "
              f"schema {list(spdf.columns)}/{list(opdf.columns)} "
              f"hash {sh}/{oh} ({elapsed:.1f}s)")
        results[name] = {
            "rows_match": ok_count, "schema_match": ok_schema,
            "hash_match": ok_hash, "spark_rows": len(spdf),
            "oracle_rows": len(opdf), "err": None, "secs": round(elapsed, 1),
        }
        if status == "FAIL":
            failures.append(name)
            srows = {tuple(map(str, r)) for r in spdf.itertuples(index=False)}
            orows = {tuple(map(str, r)) for r in opdf.itertuples(index=False)}
            for x in list(srows - orows)[:3]:
                print("    spark-only:", x)
            for x in list(orows - srows)[:3]:
                print("    oracle-only:", x)
    json_out = os.environ.get("GRAFTLINK_CHECK_JSON")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out} ({len(results)} rows)")
    print("FAILURES:" if failures else "ALL OK", failures or "")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
