"""Sequence packing (concat-and-chunk, corpus.pack_chunks): invariants,
pure-Python reference, and the DuckDB twin."""

from __future__ import annotations

import random

import duckdb
import pytest

from graftlink.corpus import pack_chunks, pack_chunks_sql
from graftlink.texthash import tokens_sql

L = 64


def _docs(seed=7, n=50):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        nt = rnd.choice([0, 1, 3, 10, 40, 90, 200])
        text = " ".join(f"w{j}" for j in range(nt))
        rows.append((i, text, "s", len(text)))
    return rows


def _py_ref(rows, seq_len):
    """(chunk_id, doc_id) -> (doc_tokens, off_in_chunk, tok_start, n)."""
    out = {}
    start = 0
    for doc_id, text, _, _ in sorted(rows):
        nt = len([t for t in text.lower().split() if t])
        if nt == 0:
            continue
        for c in range(start // seq_len, (start + nt - 1) // seq_len + 1):
            lo = max(start, c * seq_len)
            hi = min(start + nt, (c + 1) * seq_len)
            out[(c, doc_id)] = (nt, lo - c * seq_len, lo - start, hi - lo)
        start += nt
    return out


def _spark_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def test_matches_python_reference(spark):
    rows = _docs()
    got = {
        (r.chunk_id, r.doc_id): (
            r.doc_tokens, r.off_in_chunk, r.tok_start, r.n_tokens
        )
        for r in pack_chunks(_spark_df(spark, rows), L).collect()
    }
    assert got == _py_ref(rows, L)


def test_invariants(spark):
    rows = _docs(seed=11, n=80)
    df = pack_chunks(_spark_df(spark, rows), L).collect()
    total = sum(
        len([t for t in text.split() if t]) for _, text, _, _ in rows
    )
    by_chunk: dict[int, int] = {}
    by_doc: dict[int, int] = {}
    for r in df:
        by_chunk[r.chunk_id] = by_chunk.get(r.chunk_id, 0) + r.n_tokens
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0) + r.n_tokens
        assert 0 <= r.off_in_chunk < L
        assert r.off_in_chunk + r.n_tokens <= L
        assert r.n_tokens >= 1
    last = max(by_chunk)
    for c, s in by_chunk.items():
        assert s == L or c == last  # every chunk full except the final
    assert sum(by_chunk.values()) == total
    for r in df:
        assert by_doc[r.doc_id] == r.doc_tokens  # slices reassemble the doc


def test_duckdb_twin(spark):
    rows = _docs(seed=3, n=60)
    got = {
        (r.chunk_id, r.doc_id): (
            r.doc_tokens, r.off_in_chunk, r.tok_start, r.n_tokens
        )
        for r in pack_chunks(_spark_df(spark, rows), L).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?)", rows)
    orows = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(pack_chunks_sql(tokens_sql("text"), L)).fetchall()
    }
    assert got == orows


def test_empty_corpus(spark):
    rows = [(0, "", "s", 0), (1, "   ", "s", 3)]
    assert pack_chunks(_spark_df(spark, rows), L).count() == 0
