"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side design is real and tested — schema, partition-friendly
layout, Arrow-batched UDF signatures, bounded batch memory — while
the codec layer is stubbed (no image/audio libraries in this
container): `decode_media(..., codec="real")` raises
NotImplementedError at the exact seam where PIL/ffmpeg would plug in,
and `codec="fake"` runs a deterministic byte-level featureizer so the
whole pipeline is executable and verifiable end-to-end.

Layout rules for 100 TB media tables: payloads stay in their own
parquet column (never joined around), metadata is a narrow struct you
can filter/partition on without touching bytes (column pruning means
a metadata-only query never reads a payload page), and feature
extraction streams batch-by-batch through mapInArrow so one task
never holds more than maxRecordsPerBatch payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ["image", "audio", "video"]
N_HIST_BINS = 16
N_FRAME_SAMPLES = 8

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)
FEATURE_SCHEMA = (
    "media_id long, n_bytes long, byte_mean double, "
    f"histogram array<long>, frames array<long>"
)


def synth_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table derived from documents: payload =
    UTF-8 bytes of text (a stand-in blob), kind cycles by id, metadata
    derived arithmetically. Pure column expressions."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col(id_col) % 3 + 1).cast("int")
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (F.col(id_col) % 640 + 16).cast("int").alias("width"),
            (F.col(id_col) % 480 + 16).cast("int").alias("height"),
            (F.lit(16000)).cast("int").alias("sample_rate"),
            (F.col(id_col) % 9000 + 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(batch: pa.RecordBatch) -> pa.RecordBatch:
    ids = batch.column("media_id").to_numpy(zero_copy_only=False)
    payloads = batch.column("payload").to_pylist()
    n_bytes, means, hists, frames = [], [], [], []
    for p in payloads:
        arr = np.frombuffer(p or b"", dtype=np.uint8)
        n_bytes.append(len(arr))
        means.append(float(arr.mean()) if len(arr) else 0.0)
        hist, _ = np.histogram(arr, bins=N_HIST_BINS, range=(0, 256))
        hists.append(hist.astype(np.int64).tolist())
        # "frame sampling": every len/N-th byte, the stand-in for
        # video frame extraction — same batch shape as the real thing
        if len(arr) >= N_FRAME_SAMPLES:
            step = len(arr) // N_FRAME_SAMPLES
            frames.append(arr[:: step][:N_FRAME_SAMPLES].astype(np.int64).tolist())
        else:
            frames.append(arr.astype(np.int64).tolist())
    return pa.RecordBatch.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(n_bytes, pa.int64()),
            pa.array(means, pa.float64()),
            pa.array(hists, pa.list_(pa.int64())),
            pa.array(frames, pa.list_(pa.int64())),
        ],
        ["media_id", "n_bytes", "byte_mean", "histogram", "frames"],
    )


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """media -> DF[media_id, n_bytes, byte_mean, histogram, frames].

    codec="real" is the seam for PIL/librosa/ffmpeg decode —
    deliberately NotImplemented in this container; codec="fake" is the
    deterministic byte featureizer (real Arrow plumbing either way).
    """
    if codec == "real":

        def real_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            raise NotImplementedError(
                "real media decode requires PIL/librosa/ffmpeg, absent "
                "in this container; plug the codec in here"
            )
            yield  # pragma: no cover — marks this as a generator

        kernel = real_kernel
    elif codec == "fake":

        def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for b in batches:
                if b.num_rows:
                    yield _fake_features(b)

    else:
        raise ValueError(f"unknown codec: {codec}")
    return media.select("media_id", "payload").mapInArrow(kernel, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize seam: validates kind/meta JVM-side, payload
    transform is the stubbed codec step (identity here). Shows the
    shape: metadata updated by expression, bytes by kernel."""
    return media.where(F.col("kind") == "image").withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """DF[kind, n_items, total_bytes, avg_bytes] — metadata-only agg;
    with real parquet layout this never reads payload pages beyond
    the length stat (octet_length is computed from the column, so at
    scale store n_bytes in meta to skip payload IO entirely)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.round(F.avg(F.octet_length("payload")), 4).alias("avg_bytes"),
    )


def media_stats_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB twin over the same deterministic synth rule."""
    kind = f"['image','audio','video'][CAST({id_col} % 3 + 1 AS INT)]"
    # CAST: DuckDB sum(BIGINT) returns HUGEINT -> float64 in pandas,
    # which the driver canonicalizer sees as 50917.0 vs Spark's 50917
    return f"""
        SELECT {kind} AS kind, count(*) AS n_items,
               CAST(sum(octet_length(encode({text_col}))) AS BIGINT) AS total_bytes,
               round(avg(octet_length(encode({text_col}))), 4) AS avg_bytes
        FROM {table} GROUP BY 1
    """
