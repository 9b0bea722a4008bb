"""Cross-engine pandas-dtype parity for the driver compare (round-5
root-cause of the four r4 driver hash-reds).

The driver canonicalizes BOTH result frames through pandas. DuckDB
SUM(BIGINT) returns HUGEINT, which pandas materializes as float64,
while the Spark twin column arrives int64 — any dtype-sensitive
formatting then renders "3.0" vs "3" and flips the value hash even
though the values are identical. Exactly the four r4 driver-red
queries (host_link_stats, voronoi_communities, user_sessions,
graph_predicates) had HUGEINT twin columns — plus one latent
(line_dedup.n_removed) the driver's file rotation hadn't reached.
All five twins now CAST to BIGINT; this gate scans EVERY registered
oracle lazily (duckdb relation types, no execution) so a new twin
can never reintroduce the mechanism.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_no_oracle_emits_hugeint_or_decimal(con):
    import __spark_entry__ as E

    flagged = {}
    for name, q in E.oracle_sql().items():
        rel = con.sql(q)  # lazy: types resolve without executing
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")
        ]
        if bad:
            flagged[name] = bad
    assert not flagged, (
        "oracle twins whose pandas dtype would diverge from Spark's "
        f"(HUGEINT/DECIMAL -> float64/object): {flagged}"
    )


def test_fixed_reds_dtype_parity(spark, con):
    """The five repaired queries produce IDENTICAL pandas dtypes on
    both engines at sf0.001 — the condition under which any
    dtype-sensitive driver canonicalization agrees."""
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    for name in [
        "host_link_stats", "voronoi_communities", "user_sessions",
        "graph_predicates", "line_dedup",
    ]:
        spdf = qs[name](spark, SF_DIR).toPandas()
        opdf = con.execute(osql[name]).df()
        sd = {c: str(spdf[c].dtype) for c in sorted(spdf.columns)}
        od = {c: str(opdf[c].dtype) for c in sorted(opdf.columns)}
        assert sd == od, f"{name}: dtype divergence {sd} vs {od}"
