"""Value tests for the corpus-curation operators (corpus.py):
per-domain caps, repetition signals, benchmark decontamination.
Pure-Python references throughout; the DuckDB twins are exercised by
the driver contract (tools/driver_check.py)."""

from __future__ import annotations

import collections
import random

from pyspark.sql import functions as F

from graftlink.corpus import decontaminate, per_domain_cap, repetition_signals


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


# ---------------------------------------------------------------------------
# per_domain_cap
# ---------------------------------------------------------------------------


def _mk_corpus(n=400, domains=7, seed=2):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, f"doc {i}", f"d{rnd.randrange(domains)}",
                     rnd.randrange(1000)))
    return rows


def test_per_domain_cap_matches_python_topk(spark):
    rows = _mk_corpus()
    cap = 9
    by_dom = collections.defaultdict(list)
    for i, _, dom, nc in rows:
        by_dom[dom].append((-nc, i))
    want = {
        i
        for dom, lst in by_dom.items()
        for (_, i) in sorted(lst)[:cap]
    }
    got = {
        r.doc_id
        for r in per_domain_cap(
            _docs_df(spark, rows), "source", cap,
            priority=[F.col("n_chars").desc()],
        ).collect()
    }
    assert got == want


def test_per_domain_cap_salt_invariant(spark):
    # the salt changes partition sizes, never the result
    rows = _mk_corpus(seed=5)
    df = _docs_df(spark, rows)
    a = {r.doc_id for r in per_domain_cap(df, "source", 4, salts=1).collect()}
    b = {r.doc_id for r in per_domain_cap(df, "source", 4, salts=64).collect()}
    assert a == b


def test_per_domain_cap_small_domains_untouched(spark):
    rows = [(0, "x", "a", 1), (1, "y", "a", 2), (2, "z", "b", 3)]
    got = per_domain_cap(_docs_df(spark, rows), "source", 5).count()
    assert got == 3


# ---------------------------------------------------------------------------
# repetition_signals
# ---------------------------------------------------------------------------


def _py_signals(text):
    lines = text.split("\n")
    dup = (len(lines) - len(set(lines))) / len(lines) if lines else 0.0
    toks = [t for t in text.lower().split()]
    # mirror the regex-split semantics: split on \s+ keeps a leading ''
    import re

    toks = re.split(r"\s+", text.lower())
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    top = (
        max(collections.Counter(grams).values()) / len(grams) if grams else 0.0
    )
    return round(dup, 6), round(top, 6)


def test_repetition_signals_values(spark):
    texts = [
        "spam spam spam spam spam ham",
        "line one\nline two\nline one\nline three",
        "",
        "all distinct words here today",
        "ab ab ab\nab ab ab\nab ab ab",
    ]
    rows = [(i, t, "s", len(t)) for i, t in enumerate(texts)]
    got = {
        r.id: (r.dup_line_frac, r.top_bigram_frac)
        for r in repetition_signals(_docs_df(spark, rows)).collect()
    }
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        assert got[i] == _py_signals(t), (i, t, got[i], _py_signals(t))


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_flags_shared_shingles(spark):
    # doc 1 embeds an exact 8-token span of the benchmark doc; doc 2
    # shares only shorter spans
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (0, bench_text, "s", 1),
        (1, "intro words then quick brown fox jumps over the lazy dog done",
         "s", 1),
        (2, "quick brown fox but nothing else matches at all here", "s", 1),
        (3, "completely unrelated text with different tokens", "s", 1),
    ]
    docs = _docs_df(spark, rows)
    bench = docs.where("doc_id = 0")
    got = {
        r.id: r.contaminated
        for r in decontaminate(docs, bench, w=8).collect()
    }
    assert got == {0: True, 1: True, 2: False, 3: False}


def test_decontaminate_fast_mode_agrees(spark):
    rows = [
        (i, f"token{i} " + "shared span of many common words here", "s", 1)
        for i in range(6)
    ] + [(9, "nothing in common with anything", "s", 1)]
    docs = _docs_df(spark, rows)
    bench = docs.where("doc_id = 0")
    a = {r.id: r.contaminated
         for r in decontaminate(docs, bench, w=5).collect()}
    b = {r.id: r.contaminated
         for r in decontaminate(docs, bench, w=5, hash_mode="fast").collect()}
    assert a == b
    assert a[9] is False and a[1] is True


def test_curate_pipeline_stage_consistency(spark):
    import collections as _c

    from graftlink.corpus import curate
    from graftlink.dedup import near_dup_minhash
    from graftlink.textops import quality_scores

    texts = [
        ("alpha beta gamma delta epsilon zeta eta theta " * 4).strip(),
        ("alpha beta gamma delta epsilon zeta eta theta " * 4).strip(),  # exact dup
        ("alpha beta gamma delta epsilon zeta eta NEW " * 4).strip(),    # near dup
        "the quick brown fox jumps over the lazy dog and runs home now",
        "!!!",                                                            # low quality
        "numbers and words mix here with many common the and of tokens",
    ] * 8  # spread over sources
    rows = [
        (i, t, f"s{i % 3}", len(t)) for i, t in enumerate(texts)
    ]
    docs = _docs_df(spark, rows)
    out = curate(docs, quality_min=0.4, domain_cap=5).collect()
    ids = {r.doc_id for r in out}
    # survivors are a subset of the input
    assert ids <= {r[0] for r in rows}
    # per-source cap respected
    per_src = _c.Counter(r.source for r in out)
    assert all(v <= 5 for v in per_src.values()), per_src
    # split labels valid and deterministic rerun
    assert {r.split for r in out} <= {"train", "val", "test"}
    again = {(r.doc_id, r.split) for r in curate(
        docs, quality_min=0.4, domain_cap=5).collect()}
    assert again == {(r.doc_id, r.split) for r in out}
    # low-quality docs are gone
    q = {r.id: r.quality for r in quality_scores(docs).collect()}
    assert all(q[i] >= 0.4 for i in ids)
    # near-dup b-sides of surviving pairs were dropped
    nd = near_dup_minhash(docs, threshold=0.5)
    for r in nd.collect():
        assert not (r.a in ids and r.b in ids) or r.a == r.b


def test_curate_near_dup_cluster_keeper(spark):
    """Round-4 cluster canonicalization (verdict Next #5): near-dup
    components keep exactly ONE doc — the min doc_id — even when the
    pairs form a chain/star through a shared middle doc. The old
    greedy per-pair drop (drop every b of a pair a<b) kept BOTH outer
    docs of a star 1~5, 2~5 (they never appear as a b), leaking two
    transitive near-dups into the corpus."""
    from graftlink.corpus import curate
    from graftlink.dedup import near_dup_minhash

    words = [f"tok{i:03d}" for i in range(200)]

    def mk(lo):
        return " ".join(words[lo : lo + 40])

    # word-3-gram shingle overlap at offset 7: J(inner) = 31/45 ~ 0.69
    # >= 0.5; outer offset 14: J = 24/52 ~ 0.46 < 0.5 -> 1~5 and 2~5
    # but NOT 1~2. Offsets (10, 17, 24) chosen so BOTH inner pairs are
    # also LSH *candidates* (banding is deterministic but not
    # recall-1 at J~0.69; verified by the nd assertion below).
    rows = [
        (1, mk(10), "s0", len(mk(10))),
        (2, mk(24), "s0", len(mk(24))),
        (5, mk(17), "s0", len(mk(17))),
        (7, "completely different prose about rivers and bridges at dusk",
         "s0", 61),
    ]
    docs = _docs_df(spark, rows)
    nd = {(r.a, r.b) for r in near_dup_minhash(docs, threshold=0.5).collect()}
    assert nd == {(1, 5), (2, 5)}, nd
    out = {
        r.doc_id
        for r in curate(
            docs, quality_min=0.0, near_dup_threshold=0.5, domain_cap=100
        ).collect()
    }
    # exactly one survivor of the {1,2,5} cluster: the min id
    assert out & {1, 2, 5} == {1}, out
    assert 7 in out


# ---------------------------------------------------------------------------
# span_dedup (cross-document w-token window duplication)
# ---------------------------------------------------------------------------


def _span_docs(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_span_dedup_hand_computed(spark):
    from graftlink.corpus import span_dedup

    docs = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "completely different text with no shared spans at all here"),
        (2, "the quick brown fox jumps over a sleeping cat today"),
        (3, "tiny"),
        (4, ""),
    ]
    got = {
        r["id"]: (r["n_windows"], r["dup_windows"], r["flagged"])
        for r in span_dedup(_span_docs(spark, docs), w=5, threshold=0.2).collect()
    }
    # docs 0 and 2 share the 5-token windows starting at "the" and
    # "quick" ("the quick brown fox jumps", "quick brown fox jumps over")
    assert got[0] == (8, 2, True)
    assert got[2] == (6, 2, True)
    assert got[1][1] == 0 and not got[1][2]
    # short doc => single whole-sequence window; empty doc => 1 window
    assert got[3] == (1, 0, False)
    assert got[4] == (1, 0, False)


def test_span_dedup_intra_doc_repeats_not_counted(spark):
    from graftlink.corpus import span_dedup

    docs = [
        (0, "a b c d a b c d a b c d"),  # heavy INTRA-doc repetition
        (1, "x y z w v u t s r q p o"),
    ]
    got = {
        r["id"]: r["dup_windows"]
        for r in span_dedup(_span_docs(spark, docs), w=4).collect()
    }
    assert got[0] == 0  # windows repeat only within doc 0
    assert got[1] == 0


def test_span_dedup_duckdb_twin(spark):
    import duckdb

    from graftlink.corpus import span_dedup, span_dedup_sql

    docs = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "gamma delta epsilon zeta eta unrelated tail words"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 0
        (3, "solo words only in this document nowhere else"),
    ]
    sp = sorted(
        map(tuple, span_dedup(_span_docs(spark, docs), w=4, threshold=0.5).collect())
    )
    vals = ",".join("(%d, '%s')" % (i, t) for i, t in docs)
    tw = sorted(
        map(
            tuple,
            duckdb.connect()
            .execute(
                span_dedup_sql(
                    f"SELECT * FROM (VALUES {vals}) AS t(doc_id, text)",
                    w=4,
                    threshold=0.5,
                )
            )
            .fetchall(),
        )
    )
    assert sp == tw
    # the exact-dup pair is fully flagged
    flagged = {r[0]: r[4] for r in sp}
    assert flagged[0] and flagged[2] and not flagged[3]


def test_span_dedup_fast_mode_same_flags(spark):
    from graftlink.corpus import span_dedup

    docs = [
        (0, "one two three four five six seven eight"),
        (1, "one two three four five completely different ending"),
        (2, "nothing shared with anybody in this row"),
    ]
    a = {
        r["id"]: (r["n_windows"], r["dup_windows"])
        for r in span_dedup(_span_docs(spark, docs), w=5).collect()
    }
    b = {
        r["id"]: (r["n_windows"], r["dup_windows"])
        for r in span_dedup(_span_docs(spark, docs), w=5, hash_mode="fast").collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# rebalance_sources (deterministic target-mixture downsampling)
# ---------------------------------------------------------------------------


def test_rebalance_exact_proportions(spark):
    from graftlink.corpus import rebalance_sources

    rows = [(i, f"s{i % 3}") for i in range(300)]  # 100 docs per source
    df = spark.createDataFrame(rows, "doc_id long, source string")
    targets = {"s0": 1.0, "s1": 2.0, "s2": 4.0}
    # C = min(100/1, 100/2, 100/4) = 25 -> caps 25 / 50 / 100
    got = rebalance_sources(df, targets).groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"s0": 25, "s1": 50, "s2": 100}


def test_rebalance_scarcest_source_kept_whole(spark):
    from graftlink.corpus import rebalance_sources

    rows = [(i, "rare" if i < 10 else "common") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = (
        rebalance_sources(df, {"rare": 1.0, "common": 1.0})
        .groupBy("source")
        .count()
        .collect()
    )
    # equal targets -> keep ALL 10 rare docs and downsample common to 10
    assert {r["source"]: r["count"] for r in got} == {"rare": 10, "common": 10}


def test_rebalance_drops_untargeted_sources(spark):
    from graftlink.corpus import rebalance_sources

    rows = [(i, f"s{i % 2}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = rebalance_sources(df, {"s0": 1.0}).select("source").distinct().collect()
    assert [r["source"] for r in got] == ["s0"]


def test_rebalance_deterministic_and_subset_stable(spark):
    from graftlink.corpus import rebalance_sources

    rows = [(i, f"s{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    targets = {"s0": 1.0, "s1": 1.0, "s2": 2.0}
    a = sorted(r["doc_id"] for r in rebalance_sources(df, targets).collect())
    b = sorted(
        r["doc_id"]
        for r in rebalance_sources(df.repartition(7), targets).collect()
    )
    assert a == b


def test_rebalance_duckdb_twin(spark):
    import duckdb

    from graftlink.corpus import rebalance_sources, rebalance_sources_sql

    rows = [(i, f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    targets = {"s0": 1.0, "s1": 2.0, "s2": 3.0, "s3": 5.0}
    sp = sorted(map(tuple, rebalance_sources(df, targets).collect()))
    # VALUES literals are INT32 in DuckDB; the bucket hash needs int64
    vals = ",".join(f"(CAST({i} AS BIGINT), '{s}')" for i, s in rows)
    tw = sorted(
        map(
            tuple,
            duckdb.connect()
            .execute(
                rebalance_sources_sql(
                    f"SELECT * FROM (VALUES {vals}) AS t(doc_id, source)", targets
                )
            )
            .fetchall(),
        )
    )
    assert sp == tw
