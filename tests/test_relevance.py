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


# ---------------------------------------------------------------------------
# nb_quality (multinomial Naive Bayes quality classifier)
# ---------------------------------------------------------------------------


def _nb_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_nb_separates_disjoint_vocab(spark):
    from graftlink.relevance import nb_quality

    rows = [
        (0, "clean prose sentence words", True),
        (1, "prose sentence reads well", True),
        (2, "spam spam buy pills now", False),
        (3, "buy now pills spam offer", False),
        (4, "prose words read sentence", True),   # held-in positives
        (5, "pills offer spam buy", False),
    ]
    got = {r["id"]: r["predicted"] for r in nb_quality(_nb_docs(spark, rows)).collect()}
    assert got == {0: True, 1: True, 2: False, 3: False, 4: True, 5: False}


def test_nb_matches_hand_formula(spark):
    import math
    from collections import Counter

    from graftlink.relevance import nb_quality

    rows = [
        (0, "a a b", True),
        (1, "b c", True),
        (2, "c c d", False),
        (3, "d a", False),
    ]
    got = {r["id"]: r["nb_score"] for r in nb_quality(_nb_docs(spark, rows)).collect()}
    pos = Counter("a a b b c".split())
    neg = Counter("c c d d a".split())
    vocab = set(pos) | set(neg)
    tp, tn, v = sum(pos.values()), sum(neg.values()), len(vocab)
    def llr(t):
        return math.log((pos[t] + 1) / (tp + v)) - math.log((neg[t] + 1) / (tn + v))
    for i, text, _ in rows:
        toks = text.split()
        want = round(math.log(2 / 2) + math.fsum(
            sorted((toks.count(t) * llr(t) for t in set(toks)))
        ), 6)
        # fold order differs from fsum only in ulps; compare loosely
        assert got[i] == pytest.approx(want, abs=1e-6)


def test_nb_requires_both_classes(spark):
    from graftlink.relevance import nb_quality

    rows = [(0, "only one class", True), (1, "here too", True)]
    with pytest.raises(ValueError):
        nb_quality(_nb_docs(spark, rows)).collect()


def test_nb_duckdb_twin(spark):
    import duckdb

    from graftlink.relevance import nb_quality, nb_quality_sql

    rows = [
        (0, "alpha beta gamma", True),
        (1, "beta gamma delta", True),
        (2, "zeta eta theta", False),
        (3, "eta theta iota", False),
        (4, "alpha zeta beta eta", True),
    ]
    sp = sorted(map(tuple, nb_quality(_nb_docs(spark, rows)).collect()))
    vals = ",".join(f"({i}, '{t}', {str(y).upper()})" for i, t, y in rows)
    tw = sorted(
        map(
            tuple,
            duckdb.connect()
            .execute(
                nb_quality_sql(
                    f"SELECT * FROM (VALUES {vals}) AS t(doc_id, text, label)"
                )
            )
            .fetchall(),
        )
    )
    assert sp == tw
