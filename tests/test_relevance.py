"""TF-IDF / BM25 parity: hand-computed tiny fixture + DuckDB twin
equivalence (ordered-sum bit determinism) + rank sanity."""

from __future__ import annotations

import math

import duckdb
import pytest

from graftlink.relevance import (
    bm25_rank,
    bm25_rank_sql,
    tfidf_topk,
    tfidf_topk_sql,
)

DOCS = [
    (0, "spark shuffle join shuffle"),
    (1, "spark scan filter"),
    (2, "join join vector spark"),
    (3, "window sort window"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    return con


def test_tfidf_hand_computed(spark):
    got = {
        (r.doc_id, r.term): r.tfidf
        for r in tfidf_topk(docs_df(spark), k=1).collect()
    }
    # doc 0: shuffle tf=2, df=1 -> 2 * (ln(5/2)+1)
    want = round(2 * (math.log(5 / 2) + 1), 6)
    assert got == {
        (0, "shuffle"): want,
        (1, "filter"): pytest.approx(round(math.log(5 / 2) + 1, 6)),
        (2, "join"): pytest.approx(round(2 * (math.log(5 / 3) + 1), 6)),
        (3, "window"): pytest.approx(round(2 * (math.log(5 / 2) + 1), 6)),
    }


def test_tfidf_matches_twin(spark):
    got = sorted(
        (r.doc_id, r.term, r.tfidf)
        for r in tfidf_topk(docs_df(spark), k=2).collect()
    )
    want = sorted(
        map(tuple, duck().execute(
            tfidf_topk_sql("SELECT doc_id, text FROM documents", k=2)
        ).fetchall())
    )
    assert got == want


def test_bm25_matches_twin_and_ranks(spark):
    got = [
        (r.doc_id, r.score)
        for r in bm25_rank(docs_df(spark), "spark join", top=4).collect()
    ]
    want = list(
        map(tuple, duck().execute(
            bm25_rank_sql("SELECT doc_id, text FROM documents", "spark join", top=4)
        ).fetchall())
    )
    assert got == want
    # doc 2 has join x2 + spark -> best; doc 3 matches nothing
    assert got[0][0] == 2
    assert all(d != 3 for d, _ in got)


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_rank(docs_df(spark), "!!!")
