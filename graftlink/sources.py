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


# --- igraph text I/O surface (Read_Edgelist / Write_Edgelist /
# Read_Ncol; igraph@0.10.x src/io/edgelist.c, ncol.c [unverified —
# reference checkout is empty]). Text scans split across executors
# like any other file source, so these scale with partition count.
# GraphML/GML ship in graftlink/graphml.py as DRIVER-side interchange
# readers feeding the same dense-rank dictionary path (the formats
# are single-document XML/blocks — no distributed parse exists, and
# none is needed at interchange scale).

def read_edgelist(
    spark: SparkSession,
    path: str,
    weight: bool = False,
    comment: str = "#",
    delimiter: str = r"\s+",
) -> DataFrame:
    """igraph Read_Edgelist: whitespace-separated integer-id pairs,
    one edge per line -> DF[src long, dst long (, weight double)].
    Blank and comment lines are skipped."""
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("v"))
        .where((F.col("v") != "") & (~F.col("v").startswith(comment)))
        .select(F.split("v", delimiter).alias("p"))
    )
    cols = [
        F.col("p")[0].cast("long").alias("src"),
        F.col("p")[1].cast("long").alias("dst"),
    ]
    if weight:
        cols.append(F.col("p")[2].cast("double").alias("weight"))
    return lines.select(*cols)


def write_edgelist(
    edges: DataFrame, path: str, weight_col: str | None = None,
    delimiter: str = " ", mode: str = "overwrite",
) -> None:
    """igraph Write_Edgelist: one 'src dst[ weight]' line per edge
    (text directory, one shard per partition — a cat is the igraph
    single file)."""
    cols = [F.col("src").cast("string"), F.col("dst").cast("string")]
    if weight_col:
        cols.append(F.col(weight_col).cast("string"))
    edges.select(F.concat_ws(delimiter, *cols).alias("value")).write.mode(
        mode
    ).text(path)


def read_ncol(
    spark: SparkSession,
    path: str,
    weight: bool = False,
    comment: str = "#",
    delimiter: str = r"\s+",
):
    """igraph Read_Ncol: 'name name [weight]' lines with STRING vertex
    names -> (edges DF[src, dst (, weight)], names DF[id, name]) where
    ids are the engine's deterministic dense ranks (two-pass prefix
    sum, no global window — the url-dictionary machinery)."""
    from graftlink.vertices import dense_rank_ids

    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("v"))
        .where((F.col("v") != "") & (~F.col("v").startswith(comment)))
        .select(F.split("v", delimiter).alias("p"))
    )
    cols = [
        F.col("p")[0].alias("src_name"),
        F.col("p")[1].alias("dst_name"),
    ]
    if weight:
        cols.append(F.col("p")[2].cast("double").alias("weight"))
    named = lines.select(*cols)
    names = dense_rank_ids(
        named.select(F.col("src_name").alias("name")).unionAll(
            named.select(F.col("dst_name").alias("name"))
        ),
        "name",
        "id",
    )
    s = names.select(F.col("id").alias("src"), F.col("name").alias("src_name"))
    d = names.select(F.col("id").alias("dst"), F.col("name").alias("dst_name"))
    out_cols = ["src", "dst"] + (["weight"] if weight else [])
    edges = named.join(s, "src_name").join(d, "dst_name").select(*out_cols)
    return edges, names
