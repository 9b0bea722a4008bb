"""Structured Streaming extension (graftlink/streaming.py): the
oracle is Spark's stream-batch equivalence contract — each operator's
result after draining the stream must equal the batch form of the
same query over the same files — plus incremental/state semantics
across a second trigger (new files, same checkpoint)."""

from __future__ import annotations

import datetime as dt

import pytest

from graftlink.streaming import (
    arrival_dedup,
    run_available_now_to_parquet,
    incremental_degrees,
    run_available_now,
    stream_docs,
    stream_edges,
    stream_events,
    streaming_sessionize,
    windowed_event_counts,
)


def _t(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def _write_edges(spark, path, rows, mode="append"):
    spark.createDataFrame(
        rows, "src long, dst long, ts timestamp_ntz"
    ).coalesce(1).write.mode(mode).parquet(path)


def test_incremental_degrees_two_triggers(spark, tmp_path):
    data, chk = str(tmp_path / "edges"), str(tmp_path / "chk")
    batch1 = [(0, 1, _t(0)), (0, 2, _t(1)), (1, 2, _t(2))]
    _write_edges(spark, data, batch1)
    run_available_now(
        incremental_degrees(stream_edges(spark, data)), chk, "deg_t", "complete"
    )
    got1 = {r.src: r.out_deg for r in spark.sql("SELECT * FROM deg_t").collect()}
    assert got1 == {0: 2, 1: 1}

    # second trigger: only the NEW file is read (checkpoint), counts
    # accumulate — state survived
    _write_edges(spark, data, [(0, 3, _t(3)), (2, 0, _t(4))])
    run_available_now(
        incremental_degrees(stream_edges(spark, data)), chk, "deg_t2", "complete"
    )
    got2 = {r.src: r.out_deg for r in spark.sql("SELECT * FROM deg_t2").collect()}
    assert got2 == {0: 3, 1: 1, 2: 1}


def test_windowed_counts_match_batch_oracle(spark, tmp_path):
    from pyspark.sql import functions as F

    data, chk = str(tmp_path / "events"), str(tmp_path / "chk")
    rows = [
        (i, _t(3 * i), i % 4, ["view", "click"][i % 2], 1.0, "{}")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(data)

    run_available_now(
        windowed_event_counts(stream_events(spark, data), "10 minutes"),
        chk, "wc_t", "update",
    )
    got = {
        (r.w_start, r.event_type): r.n
        for r in spark.sql("SELECT * FROM wc_t").collect()
    }
    batch = (
        spark.read.parquet(data)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    want = {(r.w_start, r.event_type): r.n for r in batch.collect()}
    assert got == want and len(got) >= 8


def test_arrival_dedup_first_wins(spark, tmp_path):
    data, chk = str(tmp_path / "docs"), str(tmp_path / "chk")
    rows = [
        (0, _t(0), "alpha"),
        (1, _t(1), "beta"),
        (2, _t(2), "alpha"),  # dup content inside the watermark
        (3, _t(3), "gamma"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp_ntz, text string"
    ).coalesce(1).write.parquet(data)
    run_available_now(
        arrival_dedup(stream_docs(spark, data)), chk, "dd_t", "append"
    )
    ids = sorted(r.doc_id for r in spark.sql("SELECT * FROM dd_t").collect())
    assert ids == [0, 1, 3]


def test_streaming_sessionize_closes_on_watermark(spark, tmp_path):
    data, chk = str(tmp_path / "sess"), str(tmp_path / "chk")
    # user 7: two events 10 min apart (one session), then 50 min gap
    # (next session) — all well inside batch 1
    batch1 = [
        (0, _t(0), 7, "view", 1.0, "{}"),
        (1, _t(10), 7, "view", 1.0, "{}"),
        (2, _t(60), 7, "view", 1.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(data)
    sess = lambda: streaming_sessionize(  # noqa: E731
        stream_events(spark, data), gap_seconds=1800, watermark="10 minutes"
    )
    out = str(tmp_path / "out")
    run_available_now_to_parquet(sess(), chk, out)
    got1 = [
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.read.parquet(out).collect()
    ]
    # first trigger: session 1 (events 0,1) closed by the in-batch gap
    assert got1 == [(7, _us(_t(0)), _us(_t(10)), 2)]

    # batch 2: one much-later event pushes the watermark far past the
    # open session's end + gap -> EventTimeTimeout closes it
    spark.createDataFrame(
        [(3, _t(600), 7, "view", 1.0, "{}")], schema
    ).coalesce(1).write.mode("append").parquet(data)
    run_available_now_to_parquet(sess(), chk, out)
    got2 = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    assert (7, _us(_t(60)), _us(_t(60)), 1) in got2


def _us(d):
    return int(d.timestamp() * 0) + (
        (d - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
    )
