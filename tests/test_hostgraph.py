"""Host/domain web-graph rollups (graftlink/hostgraph.py).

Covers: host extraction edge cases (port, userinfo, apex domains),
rollup weights vs a hand-computed fixture, domain contraction,
per-host link stats, host PageRank vs a dense numpy power iteration
on the contracted graph, and determinism across parallelism.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graftlink.hostgraph import (
    domain_edges,
    domain_expr,
    host_edges,
    host_expr,
    host_link_stats,
    host_pagerank,
)


def _url_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_url string, dst_url string")


URLS = [
    # (url, expected host)
    ("https://www.example.com/a/b?q=1", "www.example.com"),
    ("http://example.com/", "example.com"),
    ("https://example.com:8443/x", "example.com"),
    ("https://user:pw@sub.example.co/x", "sub.example.co"),
    ("https://A.B.ORG/Upper", "a.b.org"),
]


def test_host_expr_edge_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in URLS], "url string")
    got = [r["h"] for r in df.select(host_expr("url").alias("h")).collect()]
    assert got == [h for _, h in URLS]


def test_domain_expr_last_two_labels(spark):
    df = spark.createDataFrame(
        [("www.example.com",), ("example.com",), ("a.b.c.example.org",)],
        "host string",
    )
    got = [r["d"] for r in df.select(domain_expr("host").alias("d")).collect()]
    assert got == ["example.com", "example.com", "example.org"]


FIXTURE = [
    ("https://a.x.org/1", "https://b.x.org/1"),
    ("https://a.x.org/2", "https://b.x.org/9"),
    ("https://a.x.org/3", "https://a.x.org/4"),  # intra-host
    ("https://b.x.org/1", "https://c.y.org/1"),
    ("https://b.x.org/2", "https://a.x.org/7"),
    ("https://c.y.org/1", "https://a.x.org/1"),
]


def test_host_edges_rollup(spark):
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_edges(_url_edges(spark, FIXTURE)).collect()
    }
    assert got == {
        ("a.x.org", "b.x.org"): 2,
        ("b.x.org", "c.y.org"): 1,
        ("b.x.org", "a.x.org"): 1,
        ("c.y.org", "a.x.org"): 1,
    }


def test_host_edges_keep_intra(spark):
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_edges(_url_edges(spark, FIXTURE), keep_intra=True).collect()
    }
    assert got[("a.x.org", "a.x.org")] == 1
    assert sum(got.values()) == len(FIXTURE)


def test_domain_edges_rollup(spark):
    # a.x.org & b.x.org collapse into x.org; only x.org<->y.org survive
    got = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in domain_edges(_url_edges(spark, FIXTURE)).collect()
    }
    assert got == {("x.org", "y.org"): 1, ("y.org", "x.org"): 1}


def test_host_link_stats(spark):
    got = {
        r["host"]: r.asDict()
        for r in host_link_stats(_url_edges(spark, FIXTURE)).collect()
    }
    a = got["a.x.org"]
    assert (a["out_links"], a["intra_links"], a["dst_hosts"]) == (3, 1, 1)
    assert a["intra_frac"] == pytest.approx(1 / 3, abs=1e-6)
    b = got["b.x.org"]
    assert (b["out_links"], b["intra_links"], b["dst_hosts"]) == (2, 0, 2)


def _numpy_weighted_pagerank(edges_w, d=0.85, iters=50):
    """Dense reference: edges_w = {(s_host, d_host): w}."""
    hosts = sorted({h for e in edges_w for h in e})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    W = np.zeros((n, n))
    for (s, t), w in edges_w.items():
        W[idx[s], idx[t]] = w
    out = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        dangling = 0.0
        for i in range(n):
            if out[i] > 0:
                contrib += r[i] * W[i] / out[i]
            else:
                dangling += r[i]
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {h: r[idx[h]] for h in hosts}


def test_host_pagerank_vs_numpy(spark):
    ue = _url_edges(spark, FIXTURE)
    got = {
        r["host"]: r["rank"]
        for r in host_pagerank(
            ue, max_iter=50, tol=0.0, checkpoint_mode="local"
        ).collect()
    }
    rolled = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_edges(ue).collect()
    }
    want = _numpy_weighted_pagerank(rolled, iters=50)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-9)


def test_rollup_deterministic_across_partitioning(spark):
    ue = _url_edges(spark, FIXTURE * 5)
    one = host_edges(ue.repartition(1)).collect()
    many = host_edges(ue.repartition(7)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_host_harmonic_matches_networkx(spark):
    import networkx as nx

    from graftlink.hostgraph import host_edges, host_harmonic

    ue = _url_edges(spark, FIXTURE)
    got = {r["host"]: r["harmonic"] for r in host_harmonic(ue).collect()}
    g = nx.Graph()
    for r in host_edges(ue).collect():
        g.add_edge(r["src_host"], r["dst_host"])
    want = nx.harmonic_centrality(g)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-9)


def test_domain_level_rank_contracts_by_domain(spark):
    """level="domain" must rank DOMAINS: the returned entities are
    exactly the domain rollup's vertex set, not hosts mislabeled as
    domains (round-4 advisor finding on jobs/run_hostgraph.py)."""
    from graftlink.hostgraph import (
        domain_edges,
        host_harmonic,
        host_pagerank,
    )

    ue = _url_edges(spark, FIXTURE * 3)
    de = domain_edges(ue)
    domains = {
        r[0]
        for r in de.select("src_domain").unionAll(de.select("dst_domain"))
        .distinct().collect()
    }
    ranked = {r["host"] for r in host_pagerank(ue, level="domain").collect()}
    assert ranked == domains
    harm = {r["host"] for r in host_harmonic(ue, level="domain").collect()}
    assert harm == domains
    # and the host-level default is unchanged (hosts != domains here)
    hosts = {r["host"] for r in host_pagerank(ue).collect()}
    assert hosts != domains


def test_rollup_for_rank_rejects_unknown_level(spark):
    from graftlink.hostgraph import _rollup_for_rank

    ue = _url_edges(spark, FIXTURE)
    with pytest.raises(ValueError):
        _rollup_for_rank(ue, "tld", "src_url", "dst_url")
