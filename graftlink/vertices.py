"""Vertex dictionary (dense ids) + degree tables.

igraph's vertices are dense ints 0..n-1 (igraph@0.10.x
src/graph/type_indexededgelist.c); all per-vertex outputs are
positional. We reproduce that with a deterministic url -> id
dictionary: ids are the global sort rank of the url. Two code paths
produce identical ids (tested):

- `window`: row_number over a global sort — fine at test scale, a
  single-reducer sort at 10^12 scale.
- `two_pass` (default): range-repartition by key, sort within
  partitions, count rows per partition, prefix-sum the counts on the
  driver (B scalars), then add partition offset + local position in a
  streaming Arrow kernel. No global window, no driver data beyond B
  longs — the scalable path (SURVEY.md §4.2.5). Never
  monotonically_increasing_id (non-dense, partition-layout-dependent).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _rank_two_pass(keys: DataFrame, col: str, out_col: str, partitions: int) -> DataFrame:
    ranged = (
        keys.repartitionByRange(partitions, col)
        .sortWithinPartitions(col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # Materialize so partition assignment is fixed between the two passes
    # (repartitionByRange samples; a recompute must not resample).
    ranged = ranged.localCheckpoint(eager=True)
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    key_field = None  # resolved per batch below

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        local = 0
        for batch in batches:
            vals = batch.column(col)
            pids = batch.column("_pid")
            if len(vals) == 0:
                continue
            base = offsets[pids[0].as_py()]
            ids = pa.array(range(base + local, base + local + len(vals)), pa.int64())
            local += len(vals)
            yield pa.RecordBatch.from_arrays([ids, vals], [out_col, col])

    schema = f"{out_col} long, {col} {dict(keys.dtypes)[col]}"
    return ranged.mapInArrow(kernel, schema)


def dense_rank_ids(
    keys: DataFrame, col: str, out_col: str = "id", method: str = "two_pass",
    partitions: int | None = None,
) -> DataFrame:
    """Distinct keys -> DF[out_col: long dense 0..k-1, col] where
    out_col is the global ascending sort rank of col. Deterministic."""
    distinct = keys.select(col).filter(F.col(col).isNotNull()).distinct()
    if method == "window":
        w = Window.orderBy(col)
        return distinct.withColumn(out_col, F.row_number().over(w) - 1).select(
            out_col, col
        )
    parts = partitions or distinct.sparkSession.sparkContext.defaultParallelism
    return _rank_two_pass(distinct, col, out_col, parts)


def encode_vertices(pages_or_urls: DataFrame, url_col: str = "url", **kw) -> DataFrame:
    """E2: DF[id long dense, url string] dictionary."""
    return dense_rank_ids(pages_or_urls.select(url_col), url_col, "id", **kw)


def encode_edges(
    edges_str: DataFrame, vertices: DataFrame,
    src_col: str = "src_url", dst_col: str = "dst_url",
) -> DataFrame:
    """E5: apply the dictionary to both endpoints -> DF[src, dst]."""
    v_src = vertices.select(F.col("id").alias("src"), F.col("url").alias(src_col))
    v_dst = vertices.select(F.col("id").alias("dst"), F.col("url").alias(dst_col))
    return (
        edges_str.join(v_src, src_col).join(v_dst, dst_col).select("src", "dst")
    )


def degrees(edges: DataFrame, direction: str = "out") -> DataFrame:
    """E9: DF[id, degree] over the given orientation ('out'|'in'|'all')."""
    if direction == "out":
        keyed = edges.select(F.col("src").alias("id"))
    elif direction == "in":
        keyed = edges.select(F.col("dst").alias("id"))
    else:
        keyed = edges.select(F.col("src").alias("id")).unionAll(
            edges.select(F.col("dst").alias("id"))
        )
    return keyed.groupBy("id").agg(F.count("*").alias("degree"))


def vertex_universe(edges: DataFrame) -> DataFrame:
    """All vertex ids appearing at either edge endpoint."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def strength(
    edges: DataFrame,
    weights: str | None = None,
    direction: str = "all",
    loops: bool = True,
) -> DataFrame:
    """DF[id, strength] — igraph Graph.strength(): weighted degree,
    the sum of incident edge weights per the orientation
    ('out'|'in'|'all'; igraph mode=). weights=None falls back to edge
    multiplicity (strength == degree). A self-loop contributes its
    weight TWICE in 'all' and once per direction otherwise (igraph's
    loop convention); loops=False drops self-loops first. Pure
    partial-agg groupBy — hub mass combines map-side."""
    w = F.col(weights) if weights else F.lit(1.0)
    e = edges if loops else edges.where(F.col("src") != F.col("dst"))
    if direction == "out":
        keyed = e.select(F.col("src").alias("id"), w.alias("w"))
    elif direction == "in":
        keyed = e.select(F.col("dst").alias("id"), w.alias("w"))
    elif direction == "all":
        keyed = e.select(F.col("src").alias("id"), w.alias("w")).unionAll(
            e.select(F.col("dst").alias("id"), w.alias("w"))
        )
    else:
        raise ValueError(f"direction must be out|in|all, got {direction!r}")
    return keyed.groupBy("id").agg(F.sum("w").alias("strength"))


def strength_sql(clean: str, weight_expr: str = "1.0",
                 direction: str = "all") -> str:
    """DuckDB twin of strength()."""
    if direction == "out":
        inc = f"SELECT src AS id, {weight_expr} AS w FROM clean"
    elif direction == "in":
        inc = f"SELECT dst AS id, {weight_expr} AS w FROM clean"
    else:
        inc = (
            f"SELECT src AS id, {weight_expr} AS w FROM clean "
            f"UNION ALL SELECT dst, {weight_expr} FROM clean"
        )
    return f"""
        WITH clean AS ({clean})
        SELECT id, sum(w) AS strength FROM ({inc}) GROUP BY id
    """
