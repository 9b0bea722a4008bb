"""PII detection/redaction (graftlink/pii.py): hand-computed parity
on crafted strings + Spark-vs-DuckDB span agreement on the same rows
(the regex subset must match identically in Java regex and RE2 —
that IS the operator's contract; the driver twin re-checks it at
corpus scale)."""

from __future__ import annotations

import duckdb
import pytest

from graftlink.pii import (
    pii_signals,
    pii_signals_sql,
    redact_pii,
    redact_pii_sql,
)

DOCS = [
    (0, "reach me at jane.doe+spam@mail.example.org or bob@x.io today"),
    (1, "server 10.0.0.1 and 192.168.255.3 up; version 1.2 is not an ip"),
    (2, "call +4915112345678 or 555-123-4567 or 555.123.4567 x89"),
    (3, "nothing sensitive here, just 42 and 3.14"),
    (4, "mixed: a@b.co at 8.8.8.8 phone 212 555 0199"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_signal_counts_hand_computed(spark, docs_df):
    got = {r.id: (r.n_emails, r.n_ipv4, r.n_phones, r.has_pii)
           for r in pii_signals(docs_df).collect()}
    assert got[0] == (2, 0, 0, True)
    assert got[1] == (0, 2, 0, True)
    assert got[2] == (0, 0, 3, True)
    assert got[3] == (0, 0, 0, False)
    assert got[4] == (1, 1, 1, True)
    assert got[5] == (0, 0, 0, False)


def test_redaction_hand_computed(spark, docs_df):
    got = {r.id: r.text for r in redact_pii(docs_df).collect()}
    assert got[0] == "reach me at <EMAIL> or <EMAIL> today"
    assert got[1] == "server <IP> and <IP> up; version 1.2 is not an ip"
    assert got[2] == "call <PHONE> or <PHONE> or <PHONE> x89"
    assert got[3] == DOCS[3][1]
    assert got[4] == "mixed: <EMAIL> at <IP> phone <PHONE>"


def test_cross_engine_span_agreement(spark, docs_df):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    src = "SELECT doc_id, text FROM documents"
    duck_sig = sorted(con.execute(pii_signals_sql(src)).fetchall())
    duck_red = sorted(con.execute(redact_pii_sql(src)).fetchall())
    spark_sig = sorted(
        (r.id, r.n_emails, r.n_ipv4, r.n_phones, r.has_pii)
        for r in pii_signals(docs_df).collect()
    )
    spark_red = sorted((r.id, r.text) for r in redact_pii(docs_df).collect())
    assert [tuple(x) for x in duck_sig] == spark_sig
    assert [tuple(x) for x in duck_red] == spark_red
