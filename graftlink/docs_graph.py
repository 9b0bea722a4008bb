"""Deterministic stand-in graph over the driver's `documents` table
(FIXTURES.md F1 "driver-testdata stand-in").

The sandbox testdata has no url->url pages corpus, so the driver-side
correctness path derives an edge table from `documents` by pure
arithmetic — expressible identically in Spark and DuckDB SQL, so the
derivation itself is oracle-checked:

    k(doc)  = doc_id % 3 + 1                 (1..3 out-links)
    dst_j   = (doc_id * 2654435761 + j * 40503) % N,  j = 1..k

2654435761 is the Knuth multiplicative-hash constant; the formula
stays in int64 for any doc_id < 3.5e9. Self-loops/duplicates are
possible by construction — downstream ops clean them (E17), which is
exactly what a real crawl edge table needs too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KNUTH = 2654435761
STEP = 40503


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def doc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DF[src long, dst long] — the deterministic stand-in edge table."""
    docs = read_documents(spark, sf_dir).select("doc_id")
    n = docs.count()
    return (
        docs.withColumn(
            "j",
            F.explode(
                F.sequence(F.lit(1), (F.col("doc_id") % 3 + 1).cast("int"))
            ),
        )
        .select(
            F.col("doc_id").alias("src"),
            F.pmod(
                F.col("doc_id") * F.lit(KNUTH) + F.col("j") * F.lit(STEP), F.lit(n)
            ).alias("dst"),
        )
    )


def doc_edges_sql() -> str:
    """DuckDB-equivalent SQL for doc_edges (oracle side); N is taken
    from the documents view itself so the SQL is sf-independent."""
    return f"""
        SELECT d.doc_id AS src,
               (d.doc_id * {KNUTH} + t.j * {STEP})
                 % (SELECT count(*) FROM documents) AS dst
        FROM documents d
        CROSS JOIN (SELECT j FROM generate_series(1, 3) AS s(j)) t
        WHERE t.j <= d.doc_id % 3 + 1
    """


def clean_edges(edges: DataFrame) -> DataFrame:
    """E17: drop self-loops + duplicate edges."""
    return edges.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
