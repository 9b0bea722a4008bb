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


def scatter(joined, kind: str):
    """Run the named kernel over `adj join state` output."""
    kernels: dict[str, tuple[Callable, str]] = {
        "pagerank": (pr_scatter, PR_CONTRIB_SCHEMA),
        "label": (label_scatter, LABEL_MSG_SCHEMA),
    }
    fn, schema = kernels[kind]
    return joined.mapInArrow(fn, schema)
