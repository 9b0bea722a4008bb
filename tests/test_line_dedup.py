"""Cross-corpus line dedup (C4/RefinedWeb keep-first recipe):
Spark vs the DuckDB twin and a pure-Python oracle."""

from __future__ import annotations

import duckdb
import pytest

from graftlink.corpus import line_dedup, line_dedup_sql


def py_oracle(docs, min_dup=2):
    lines = []
    for doc_id, text in docs:
        for pos, line in enumerate(text.split("\n")):
            lines.append((doc_id, pos, line))
    from collections import Counter

    cnt = Counter(l for _, _, l in lines)
    first = {}
    for doc_id, pos, line in sorted(lines):
        first.setdefault(line, (doc_id, pos))
    out = {}
    for doc_id, text in docs:
        kept, removed = [], 0
        for pos, line in enumerate(text.split("\n")):
            if cnt[line] >= min_dup and first[line] != (doc_id, pos):
                removed += 1
            else:
                kept.append(line)
        out[doc_id] = (len(text.split("\n")), removed, "\n".join(kept))
    return out


def got_spark(spark, docs, min_dup=2):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: (r.n_lines, r.n_removed, r.text_clean)
        for r in line_dedup(df, min_dup_count=min_dup).collect()
    }


def got_duck(docs, min_dup=2):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(docs))
    return {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(line_dedup_sql(min_dup)).fetchall()
    }


DOCS = [
    (1, "alpha\nBOILER\nbeta"),
    (2, "BOILER\ngamma\nBOILER"),
    (3, "BOILER"),
    (4, "delta\nepsilon"),
    (5, ""),
]


def test_keep_first_semantics(spark):
    want = py_oracle(DOCS)
    assert got_spark(spark, DOCS) == want
    assert got_duck(DOCS) == want
    # the keeper is doc 1 pos 1; every other BOILER occurrence gone
    assert want[1][2] == "alpha\nBOILER\nbeta"
    assert want[2] == (3, 2, "gamma")
    assert want[3] == (1, 1, "")


def test_within_doc_duplicates_count_globally(spark):
    docs = [(1, "X\nX"), (2, "solo")]
    want = py_oracle(docs)
    assert want[1] == (2, 1, "X")
    assert got_spark(spark, docs) == want
    assert got_duck(docs) == want


def test_threshold_3(spark):
    docs = [(1, "A\nB"), (2, "A\nB"), (3, "A")]
    want = py_oracle(docs, 3)
    assert want[2] == (2, 1, "B")  # A appears 3x, B only 2x
    assert got_spark(spark, docs, 3) == want
    assert got_duck(docs, 3) == want


def test_empty_and_untouched_docs(spark):
    got = got_spark(spark, DOCS)
    assert got[4] == (2, 0, "delta\nepsilon")
    assert got[5] == (1, 0, "")
