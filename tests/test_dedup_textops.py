"""Training-data pipeline: dedup + text analysis parity tests.

Oracles are pure-Python reimplementations of the portable spec
(tests/oracles.py pattern) — independent of both Spark and DuckDB —
so the three-way agreement (Spark == DuckDB via driver_check,
Spark == Python here) pins the spec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graftlink.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_minhash,
    simhash_fingerprints,
    simhash_near_dups,
)
from graftlink.texthash import PRIME, _perm_consts
from graftlink.textops import lang_id, quality_scores, token_stats

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (1, "the quick brown fox jumps over the lazy cat and runs far away today"),  # near-dup of 0
    (2, "completely unrelated content about spark dataframes and shuffles"),
    (3, "der hund und die katze sind nicht mit der maus"),  # German
    (4, "le chat est dans la maison pour le moment"),  # French
    (5, ""),  # empty
    (6, "the quick brown fox jumps over the lazy dog and runs far away today"),  # exact dup of 0
    (7, "!!! ??? ... ;;; :::"),  # punctuation only
]


def py_poly_hash(s: str) -> int:
    acc = 7
    if s == "":
        return (acc * 31) % PRIME  # split('') of '' -> [''] with codepoint 0
    for c in s:
        acc = (acc * 31 + ord(c)) % PRIME
    return acc


def py_shingles(text: str, w: int = 3) -> set[int]:
    toks = text.lower().split()
    if not toks:
        return {py_poly_hash("")}
    n = len(toks)
    return {
        py_poly_hash(" ".join(toks[i : i + w]))
        for i in range(max(n - w + 1, 1))
    }


def py_minhash(sh: set[int], k: int = 16) -> list[int]:
    return [min((s * a + b) % PRIME for s in sh) for a, b in _perm_consts(k)]


def py_jaccard(a: set[int], b: set[int]) -> float:
    return len(a & b) / max(len(a | b), 1)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_minhash_signature_matches_python_oracle(docs_df):
    rows = {
        r.id: (sorted(r.shingles), list(r.sig))
        for r in minhash_signatures(docs_df).collect()
    }
    for doc_id, text in DOCS:
        sh = py_shingles(text)
        assert rows[doc_id][0] == sorted(sh), f"shingles mismatch doc {doc_id}"
        assert rows[doc_id][1] == py_minhash(sh), f"sig mismatch doc {doc_id}"


def test_minhash_fast_mode_same_shape(docs_df):
    sigs = minhash_signatures(docs_df, hash_mode="fast").collect()
    assert all(len(r.sig) == 16 for r in sigs)
    # near-dups agree on most minhashes in fast mode too
    by_id = {r.id: list(r.sig) for r in sigs}
    agree = sum(a == b for a, b in zip(by_id[0], by_id[1]))
    assert agree >= 10


def test_near_dup_minhash_finds_planted_pair(docs_df):
    pairs = {(r.a, r.b): r.jaccard for r in near_dup_minhash(docs_df, threshold=0.5).collect()}
    assert (0, 1) in pairs  # one-token edit
    assert (0, 6) in pairs and pairs[(0, 6)] == 1.0  # exact dup
    assert (1, 6) in pairs
    assert not any({a, b} & {2, 3, 4} for a, b in pairs)  # no false positives


def test_jaccard_values_match_python(docs_df):
    sigs = minhash_signatures(docs_df)
    got = {
        (r.a, r.b): r.jaccard
        for r in near_dup_minhash(docs_df, threshold=0.0).collect()
    }
    sh = {i: py_shingles(t) for i, t in DOCS}
    for (a, b), j in got.items():
        assert j == pytest.approx(py_jaccard(sh[a], sh[b]), abs=1e-6)


def test_lsh_candidates_superset_of_high_jaccard(docs_df):
    """LSH guarantee direction we rely on: exact dups always collide."""
    cands = {(r.a, r.b) for r in lsh_candidate_pairs(minhash_signatures(docs_df)).collect()}
    assert (0, 6) in cands


def test_exact_dedup(docs_df):
    rows = {r.keeper_id: r.n_copies for r in exact_dedup(docs_df).collect()}
    assert rows[0] == 2  # docs 0 and 6
    assert 6 not in rows
    assert sum(rows.values()) == len(DOCS)


def test_exact_dedup_hash_collision_injection(docs_df):
    """Force every doc onto ONE 64-bit 'hash' value: the md5 in-group
    verify must still split distinct texts, so the hash-grouped plan
    equals the semantic groupBy(text) spec even under total collision."""
    weak = exact_dedup(docs_df, hash_fn=lambda c: F.lit(0).cast("long"))
    spec = (
        docs_df.groupBy("text")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
        .select("keeper_id", "n_copies")
    )
    assert sorted(map(tuple, weak.collect())) == sorted(map(tuple, spec.collect()))


def test_exact_dedup_verify_text_mode(docs_df):
    got = sorted(map(tuple, exact_dedup(docs_df, verify="text").collect()))
    ref = sorted(map(tuple, exact_dedup(docs_df).collect()))
    assert got == ref


def test_simhash_radius_guard(docs_df):
    with pytest.raises(ValueError):
        simhash_near_dups(simhash_fingerprints(docs_df), radius=3)


def test_simhash_near_dup_banded_equals_full_scan(spark, docs_df):
    """The banded plan must return EXACTLY the hamming<=2 pairs."""
    fps = simhash_fingerprints(docs_df)
    got = {(r.a, r.b, r.hamming) for r in simhash_near_dups(fps).collect()}
    vals = {r.id: r.simhash for r in fps.collect()}
    want = {
        (a, b, bin(vals[a] ^ vals[b]).count("1"))
        for a in vals
        for b in vals
        if a < b and bin(vals[a] ^ vals[b]).count("1") <= 2
    }
    assert got == want
    assert any(a == 0 and b == 6 for a, b, _ in got)  # exact dup -> distance 0


def test_simhash_deterministic_across_partitioning(spark, docs_df):
    one = {(r.id, r.simhash) for r in simhash_fingerprints(docs_df.repartition(1)).collect()}
    many = {(r.id, r.simhash) for r in simhash_fingerprints(docs_df.repartition(7)).collect()}
    assert one == many


def test_token_stats(docs_df):
    rows = {r.id: r for r in token_stats(docs_df).collect()}
    assert rows[5].n_tokens == 0 and rows[5].mean_token_len == 0.0
    assert rows[0].n_tokens == 14
    assert rows[7].n_words == 0 and rows[7].n_punct == 15
    text0 = DOCS[0][1]
    assert rows[0].n_chars == len(text0)


def test_quality_scores_ordering(docs_df):
    rows = {r.id: r.quality for r in quality_scores(docs_df).collect()}
    # English prose beats punctuation soup and empty docs
    assert rows[0] > rows[7]
    assert rows[0] > rows[5]
    assert all(0.0 <= q <= 1.0 for q in rows.values())


def test_lang_id(docs_df):
    rows = {r.id: r.lang_pred for r in lang_id(docs_df).collect()}
    assert rows[0] == "en"
    assert rows[3] == "de"
    assert rows[4] == "fr"
    assert rows[5] == "und"
