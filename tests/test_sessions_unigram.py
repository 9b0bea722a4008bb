"""Hand-computed parity for sessionization (graftlink/sessions.py)
and the unigram-LM quality score (relevance.unigram_logprob), plus
cross-engine twin agreement on the same fixture rows."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from graftlink.relevance import unigram_logprob, unigram_logprob_sql
from graftlink.sessions import session_stats, sessionize, session_stats_sql


def _ts(minutes, micros=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes, microseconds=micros)


EVENTS = [
    # user 1: three events, gap 10min/40min -> sessions {e0,e1}, {e2}
    (0, _ts(0), 1),
    (1, _ts(10), 1),
    (2, _ts(50), 1),
    # user 2: sub-second boundary — 30min + 1us is OUT of a 30min gap
    (3, _ts(0), 2),
    (4, _ts(30, 1), 2),
    # user 3: ts tie broken by event_id; both inside one session
    (5, _ts(5), 3),
    (6, _ts(5), 3),
]


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, ts timestamp_ntz, user_id long"
    )


def test_sessionize_hand_computed(spark, events_df):
    got = {
        r.event_id: (r.user_id, r.session_idx)
        for r in sessionize(events_df, gap_seconds=1800).collect()
    }
    assert got[0] == (1, 1) and got[1] == (1, 1) and got[2] == (1, 2)
    assert got[3] == (2, 1) and got[4] == (2, 2)  # 30min+1us > gap
    assert got[5] == (3, 1) and got[6] == (3, 1)


def test_session_stats_hand_computed(spark, events_df):
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_s)
        for r in session_stats(events_df, gap_seconds=1800).collect()
    }
    assert got[(1, 1)] == (2, 600.0)
    assert got[(1, 2)] == (1, 0.0)
    assert got[(2, 2)] == (1, 0.0)
    assert got[(3, 1)] == (2, 0.0)


def test_sessions_cross_engine(spark, events_df):
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT)")
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", EVENTS)
    duck = sorted(
        tuple(x) for x in con.execute(
            session_stats_sql("SELECT * FROM events", gap_seconds=1800)
        ).fetchall()
    )
    sp = sorted(
        (r.user_id, r.session_idx, r.n_events, r.start_us, r.end_us, r.duration_s)
        for r in session_stats(events_df, gap_seconds=1800).collect()
    )
    assert duck == sp


DOCS = [
    (0, "a a b"),
    (1, "b c"),
    (2, ""),  # tokenless -> n_tokens 0, score 0.0
]


def test_unigram_logprob_hand_computed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.id: (r.n_tokens, r.logprob_per_token)
        for r in unigram_logprob(df).collect()
    }
    # corpus: a:2 b:2 c:1, T=5, V=3 -> p(a)=3/8, p(b)=3/8, p(c)=2/8
    lp_a = math.log(3 / 8)
    lp_c = math.log(2 / 8)
    assert got[0] == (3, round(3 * lp_a / 3, 6))
    assert got[1] == (2, round((lp_a + lp_c) / 2, 6))
    assert got[2] == (0, 0.0)


def test_unigram_cross_engine(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    duck = sorted(
        tuple(x) for x in con.execute(
            unigram_logprob_sql("SELECT doc_id, text FROM documents")
        ).fetchall()
    )
    sp = sorted(
        (r.id, r.n_tokens, r.logprob_per_token)
        for r in unigram_logprob(df).collect()
    )
    assert duck == sp
