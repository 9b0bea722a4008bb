"""Gap-based event sessionization — the standard clickstream/telemetry
primitive (§2C analytics layer over the `events` table; no igraph
anchor — engine-extension surface like textops/pii).

A session is a maximal run of a user's events where consecutive
events are <= `gap` apart; the canonical formulation is lag +
running-sum-of-boundaries, and that is exactly what both engines run:

    new_session = (prev ts is null) OR (ts - prev_ts > gap)
    session_idx = running sum of new_session per user (1-based)

Scale shape: ONE per-user window (partitioned by the high-cardinality
user key, ordered by (ts, event_id) for a total order under ts ties)
— a single hash exchange on user_id; both window functions (lag +
running sum) share it, and the stats aggregation is a partial-agg
groupBy on (user_id, session_idx) that arrives pre-partitioned, so
Catalyst plans zero additional exchanges. The per-user partition is
the irreducible unit of sequential work in sessionization; a
degenerate hot user (bot traffic) is a data-quality cap upstream, not
a plan problem — same declared-skew contract as latest_event_per_user.

Cross-engine determinism: all arithmetic is integer MICROSECONDS —
timestamp_diff(MICROSECOND, ntz-epoch, ts) on the Spark side, which
works on TIMESTAMP_NTZ columns and is independent of the session
timezone (unix_micros rejects NTZ; an NTZ->LTZ cast would make the
result depend on spark.sql.session.timeZone), matching DuckDB's
epoch_us(naive) exactly; a cast to long would truncate to seconds and
merge sub-second boundaries differently than the twin. Durations
become doubles only at the final rounded division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """DF[event_id, user_id, ts_us, session_idx] — every event tagged
    with its 1-based per-user session index."""
    gap_us = int(gap_seconds) * 1_000_000
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    us = F.timestamp_diff("MICROSECOND", epoch, F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(id_col).asc())
    new_s = (
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us)
    ).cast("long")
    run = Window.partitionBy(user_col).orderBy(us.asc(), F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        us.alias("ts_us"),
        F.sum(new_s).over(run).alias("session_idx"),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """DF[user_id, session_idx, n_events, start_us, end_us,
    duration_s] — one row per session; arrives pre-partitioned by
    user_id from the window, so the groupBy adds no exchange."""
    s = sessionize(events, gap_seconds, user_col, ts_col, id_col)
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.round((F.max("ts_us") - F.min("ts_us")) / 1_000_000.0, 6).alias(
            "duration_s"
        ),
    )


# ---------------------------------------------------------------------------
# DuckDB twins — identical window spec, identical integer arithmetic
# ---------------------------------------------------------------------------


def _sessionize_sql(source_sql: str, gap_seconds: int) -> str:
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
        flagged AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > {gap_us}
                        THEN 1 ELSE 0 END AS new_s
            FROM ({source_sql})
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts) ASC, event_id ASC)
        ),
        tagged AS (
            SELECT event_id, user_id, ts_us,
                   sum(new_s) OVER (
                       PARTITION BY user_id
                       ORDER BY ts_us ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_idx
            FROM flagged
        )
    """


def sessionize_sql(source_sql: str, gap_seconds: int = 1800) -> str:
    return f"""
        WITH {_sessionize_sql(source_sql, gap_seconds)}
        SELECT event_id, user_id, ts_us,
               CAST(session_idx AS BIGINT) AS session_idx
        FROM tagged
    """


def session_stats_sql(source_sql: str, gap_seconds: int = 1800) -> str:
    return f"""
        WITH {_sessionize_sql(source_sql, gap_seconds)}
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               count(*) AS n_events,
               min(ts_us) AS start_us,
               max(ts_us) AS end_us,
               round((max(ts_us) - min(ts_us)) / 1000000.0, 6) AS duration_s
        FROM tagged GROUP BY user_id, session_idx
    """
