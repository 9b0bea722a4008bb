"""Sources & sinks: pages reader (Iceberg seam), snapshot dedup,
bucketed edge/adjacency persistence.

Iceberg seam (SURVEY.md §7 step 10): production reads
`spark.read.format("iceberg").load(table)` with partition transforms
`bucket(B, url)` / `days(warc_ts)` pruning at scan; the sandbox has no
Iceberg runtime jar, so `format="parquet"` reads a parquet directory
with the identical schema. Everything downstream is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """E1: scan the pages corpus. Declared schema, never inferred, so
    column pruning/pushdown plans are stable across snapshots."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def latest_snapshot(pages: DataFrame) -> DataFrame:
    """E19: keep the latest warc_ts row per url (ties: arbitrary-but-
    deterministic via html bytes as secondary key is unnecessary —
    generator guarantees distinct warc_ts per url snapshot)."""
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def write_edges_bucketed(edges: DataFrame, table: str, buckets: int = 32) -> None:
    """E14: persist the long-form edge table bucketed by src so any
    later src-keyed join/agg is co-located without a shuffle. On
    Iceberg this is `PARTITIONED BY (bucket(B, src))`."""
    (
        edges.write.mode("overwrite")
        .bucketBy(buckets, "src")
        .sortBy("src")
        .format("parquet")
        .saveAsTable(table)
    )


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)
