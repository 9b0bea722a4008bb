"""Simulate the driver's verify pass: entry() smoke + queries() vs
oracle_sql() DuckDB compare (row count, schema, order-insensitive
value hash), like CORRECTNESS_r{N}.json.

Usage: python tools/driver_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, colnames) -> str:
    """Order-insensitive: sort columns by name, format values, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    fmt_rows = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        fmt_rows.append("\x1f".join(vals))
    fmt_rows.sort()
    return hashlib.sha256("\x1e".join(fmt_rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from graftlink.session import get_spark

    spark = get_spark("driver-check", cores=8, shuffle_partitions=8)

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
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        elapsed = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name}: rows-only {len(srows)} rows ({elapsed:.1f}s)")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = [tuple(r) for r in ores.fetchall()]
        ok_count = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK" if (ok_count and ok_schema and ok_hash) else "FAIL"
        print(f"  {name}: {status} rows {len(srows)}/{len(orows)} "
              f"schema {scols}/{ocols} hash {sh}/{oh} ({elapsed:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            sset, oset = set(srows), set(orows)
            for x in list(sset - oset)[:3]:
                print("    spark-only:", x)
            for x in list(oset - sset)[:3]:
                print("    oracle-only:", x)
    print("FAILURES:" if failures else "ALL OK", failures or "")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
