"""Structured Streaming extension layer — incremental maintenance of
engine aggregates over unbounded inputs.

The reference surface (igraph) is strictly BATCH (SURVEY.md §1.3:
"streams / time-series — absent in reference"); parity needs nothing
here. This module is the declared engine EXTENSION for stream-shaped
inputs: the operators a link-graph + corpus pipeline keeps running
between crawls (edge-arrival degree maintenance, event-time windowed
activity, arrival dedup, gap sessionization), each expressed as the
idiomatic Structured Streaming form of an existing batch operator so
the BATCH QUERY IS THE ORACLE — Spark's stream-batch equivalence
contract ("the result table equals running the batch query over the
prefix") is what the tests assert, trigger by trigger.

Design rules (the batch engine's, restated for streams):
- declared schemas only — schema inference is nondeterministic and
  disabled on file streams anyway;
- watermarks require TIMESTAMP (LTZ): NTZ inputs are cast under the
  engine session's pinned UTC (graftlink.session sets
  spark.sql.session.timeZone=UTC), so wall-clock values are preserved
  deterministically;
- event-time + watermark for anything windowed or deduplicating, so
  state is bounded (the 100 TB concern: an unbounded dropDuplicates
  or window state grows forever; the watermark is the eviction
  contract);
- aggregations stay partial-agg shaped: groupBy(window, key) and
  groupBy(key) counts combine map-side exactly as in batch;
- the one custom stateful operator (gap sessionization) uses
  applyInPandasWithState with EventTimeTimeout — sessions close when
  the WATERMARK passes the gap, the deterministic streaming
  restatement of sessions.sessionize's lag-based boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

EDGES_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), True),
        T.StructField("dst", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
    ]
)

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.readStream.format(fmt).schema(EVENTS_STREAM_SCHEMA).load(path)


def stream_edges(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.readStream.format(fmt).schema(EDGES_STREAM_SCHEMA).load(path)


def stream_docs(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.readStream.format(fmt).schema(DOCS_STREAM_SCHEMA).load(path)


def incremental_degrees(edges: DataFrame) -> DataFrame:
    """Running out-degree per src — the streaming form of
    vertices.out_degree. Pure keyed count: state is one long per
    vertex, combines map-side; run in update/complete mode."""
    return edges.groupBy("src").agg(F.count("*").alias("out_deg"))


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts per event_type with a
    watermark bounding late data AND state size. Output columns are
    flattened (start/end) so sinks and the batch oracle align."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
        )
    )


def arrival_dedup(
    docs: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup on the engine's 40-byte content key
    (dedup.py discipline: hash columns, never raw text, carry the
    shuffle) — first arrival wins; the watermark bounds the key state
    to one horizon of content hashes."""
    keyed = docs.select(
        "doc_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.xxhash64(F.col("text")).alias("h64"),
        F.md5(F.col("text")).alias("h128"),
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["h64", "h128"]
    )


def streaming_sessionize(events: DataFrame, gap_seconds: int = 1800,
                         watermark: str = "2 hours") -> DataFrame:
    """DF[user_id, session_start_us, session_end_us, n_events] — gap
    sessions emitted when the event-time WATERMARK passes the session
    end + gap (the streaming restatement of sessions.session_stats;
    late events inside the watermark extend their session, events
    later than the watermark are dropped by the engine).

    applyInPandasWithState keyed by user: state = the open session
    (start_us, end_us, n). Each batch folds the user's new events in
    ts order; a gap > `gap_seconds` closes the current session into
    the output and starts a new one; EventTimeTimeout closes the open
    session once the watermark passes end_us + gap."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    out_schema = (
        "user_id long, session_start_us long, session_end_us long, n_events long"
    )
    state_schema = "start_us long, end_us long, n long"

    def fold(key, pdfs, state: GroupState):
        (user,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((user, s, e, n))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            if len(rows):
                # datetime64[ns] -> integer MICROSECONDS (the batch
                # sessionizer's unit)
                us = (
                    (pd.to_datetime(rows["ts"]).astype("int64") // 1000)
                    .sort_values()
                    .tolist()
                )
                if state.exists:
                    cur = list(state.get)
                else:
                    cur = None
                for t in us:
                    if cur is None:
                        cur = [t, t, 1]
                    elif t - cur[1] > gap_us:
                        closed.append((user, cur[0], cur[1], cur[2]))
                        cur = [t, t, 1]
                    else:
                        cur[1] = max(cur[1], t)
                        cur[2] += 1
                state.update(tuple(cur))
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )

    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    table_name: str,
    output_mode: str = "update",
) -> None:
    """Drain everything currently available into an in-memory sink
    (one availableNow trigger), blocking until done — the test/demo
    driver; production swaps the sink for parquet/Kafka and the
    trigger for processingTime."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_to_parquet(
    stream_df: DataFrame, checkpoint_dir: str, out_path: str
) -> None:
    """Append-mode drain into a parquet sink — unlike the memory sink
    this RECOVERS from its checkpoint, so repeated calls process only
    newly-arrived input (the production shape for the stateful
    operators; stateful append output + resumable checkpoints)."""
    q = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
