"""Parity tests for seeded random walks, dyad census, 4-clique
counting, and deterministic hash sampling / splits.

Value oracles: a pure-Python replay of the walk hash rule (walks are
deterministic BY DESIGN, so the oracle is exact equality, not a
distribution test), networkx/itertools brute force for dyads and
4-cliques, and binomial-bound checks for the samplers. The DuckDB
twins are exercised by the driver contract (tools/driver_check.py)."""

from __future__ import annotations

import itertools
import random

import networkx as nx

from graftlink.metrics import dyad_census
from graftlink.sampling import assign_splits, hash_sample
from graftlink.triangles import four_clique_count
from graftlink.walks import A1, A2, A3, A4, C, P, random_walks

from tests.conftest import edges_df


def _er_pairs(n, m, seed, directed=True):
    rnd = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b and (directed or a < b):
            pairs.add((a, b))
    return sorted(pairs)


# ---------------------------------------------------------------------------
# random walks
# ---------------------------------------------------------------------------


def _replay_walks(pairs, starts, steps):
    """Pure-Python replay of the argmin-hash next-hop rule."""
    adj: dict[int, list[int]] = {}
    for a, b in set(pairs):
        if a != b:
            adj.setdefault(a, []).append(b)
    rows = set()
    for w in starts:
        cur = w
        rows.add((w, 0, w))
        for t in range(1, steps + 1):
            outs = adj.get(cur)
            if not outs:
                break
            v = cur
            cur = min(
                outs,
                key=lambda d: (
                    ((w % P) * A1 + (t % P) * A2 + (v % P) * A3
                     + (d % P) * A4 + C) % P,
                    d,
                ),
            )
            rows.add((w, t, cur))
    return rows


def test_walks_match_python_replay(spark):
    pairs = _er_pairs(40, 160, seed=3)
    starts = [0, 5, 17, 33]
    got = {
        (r.walk, r.step, r.vertex)
        for r in random_walks(edges_df(spark, pairs), starts, 10).collect()
    }
    assert got == _replay_walks(pairs, starts, 10)


def test_walks_deterministic_across_partitionings(spark):
    pairs = _er_pairs(30, 90, seed=9)
    df = edges_df(spark, pairs)
    a = {(r.walk, r.step, r.vertex)
         for r in random_walks(df, [1, 2, 3], 8, buckets=2).collect()}
    b = {(r.walk, r.step, r.vertex)
         for r in random_walks(df.repartition(7), [1, 2, 3], 8,
                               buckets=5).collect()}
    assert a == b


def test_walks_stop_at_sink(spark):
    # 0 -> 1 -> 2, and 2 has no out-edges: walk ends at step 2
    df = edges_df(spark, [(0, 1), (1, 2)])
    rows = sorted(
        (r.walk, r.step, r.vertex)
        for r in random_walks(df, [0], 10).collect()
    )
    assert rows == [(0, 0, 0), (0, 1, 1), (0, 2, 2)]


def test_walks_step_choice_spreads_over_neighbors(spark):
    # hash-argmin should not systematically favour one neighbor: from
    # a star center with 4 out-neighbors, 64 walks' first steps must
    # hit every neighbor
    pairs = [(0, d) for d in (1, 2, 3, 4)]
    starts_df = spark.createDataFrame(
        [(w, 0) for w in range(64)], "walk long, vertex long"
    )
    first = (
        random_walks(edges_df(spark, pairs), starts_df, 1)
        .where("step = 1")
        .collect()
    )
    hits = {r.vertex for r in first}
    assert hits == {1, 2, 3, 4}


# ---------------------------------------------------------------------------
# dyad census
# ---------------------------------------------------------------------------


def test_dyad_census_brute_force(spark):
    pairs = _er_pairs(25, 120, seed=5)
    es = set(pairs)
    n = 25
    mut = asym = 0
    for a, b in itertools.combinations(range(n), 2):
        fwd, rev = (a, b) in es, (b, a) in es
        if fwd and rev:
            mut += 1
        elif fwd or rev:
            asym += 1
    # make sure every vertex 0..24 appears so the vertex universe is n
    assert {v for p in pairs for v in p} == set(range(n))
    row = dyad_census(edges_df(spark, pairs)).collect()[0]
    assert (row.mut, row.asym, row.nulls) == (
        mut, asym, n * (n - 1) // 2 - mut - asym
    )


def test_dyad_census_ignores_loops_and_dups(spark):
    df = edges_df(spark, [(0, 1), (0, 1), (1, 0), (2, 2), (1, 2)])
    row = dyad_census(df).collect()[0]
    assert (row.mut, row.asym, row.nulls) == (1, 1, 1)


# ---------------------------------------------------------------------------
# 4-cliques
# ---------------------------------------------------------------------------


def test_four_cliques_networkx(spark):
    pairs = _er_pairs(18, 70, seed=7, directed=False)
    G = nx.Graph(pairs)
    want = sum(
        1
        for q in itertools.combinations(sorted(G.nodes), 4)
        if all(G.has_edge(a, b) for a, b in itertools.combinations(q, 2))
    )
    assert want > 0  # fixture must actually contain 4-cliques
    got = four_clique_count(edges_df(spark, pairs)).collect()[0].n_4cliques
    assert got == want


def test_four_cliques_k5_and_direction_blind(spark):
    # K5 has C(5,4)=5 4-cliques; mixed edge directions + dups ignored
    pairs = [(a, b) for a in range(5) for b in range(5) if a != b]
    assert four_clique_count(
        edges_df(spark, pairs)
    ).collect()[0].n_4cliques == 5


# ---------------------------------------------------------------------------
# hash sampling / splits
# ---------------------------------------------------------------------------


def _ids_df(spark, n):
    return spark.range(n).select("id")


def test_hash_sample_rate_and_determinism(spark):
    for mode in ("portable", "fast"):
        df = hash_sample(_ids_df(spark, 20_000), "id", 0.1, seed=3,
                         hash_mode=mode)
        got = {r.id for r in df.collect()}
        # binomial(20000, 0.1): ±5 sigma band
        assert abs(len(got) - 2000) < 5 * (20_000 * 0.1 * 0.9) ** 0.5
        again = {r.id for r in hash_sample(_ids_df(spark, 20_000), "id",
                                           0.1, seed=3,
                                           hash_mode=mode).collect()}
        assert got == again


def test_hash_sample_is_subset_across_rates(spark):
    # bucket < cut is monotone in rate: the 5% sample nests in the 20%
    small = {r.id for r in hash_sample(_ids_df(spark, 5_000), "id",
                                       0.05, seed=1).collect()}
    big = {r.id for r in hash_sample(_ids_df(spark, 5_000), "id",
                                     0.20, seed=1).collect()}
    assert small < big


def test_assign_splits_partition_and_weights(spark):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = assign_splits(_ids_df(spark, 20_000), "id", w, seed=2).collect()
    by = {}
    for r in rows:
        by.setdefault(r.split, set()).add(r.id)
    assert sum(len(v) for v in by.values()) == 20_000  # total partition
    assert set(by) == set(w)
    for name, frac in w.items():
        exp = 20_000 * frac
        sd = (20_000 * frac * (1 - frac)) ** 0.5
        assert abs(len(by[name]) - exp) < 5 * sd, (name, len(by[name]))


def test_splits_and_sample_agree_across_hash_modes_on_shape(spark):
    # fast mode (xxhash64) has no cross-engine oracle; gate its shape:
    # same totality + same weight bands as portable
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    rows = assign_splits(_ids_df(spark, 10_000), "id", w, seed=4,
                         hash_mode="fast").collect()
    counts = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert sum(counts.values()) == 10_000
    assert counts["train"] > 8 * counts["val"]


def test_stratified_sample_rates_and_determinism(spark):
    from graftlink.sampling import stratified_sample

    import pyspark.sql.functions as F

    df = spark.range(0, 40000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("g"),
    )
    out = stratified_sample(
        df, "k", "g", {"s0": 1.0, "s1": 0.5, "s2": 0.0}, default_rate=0.1, seed=3
    )
    got = {r.g: r.c for r in out.groupBy("g").agg(F.count("*").alias("c")).collect()}
    assert got.get("s0") == 10000
    assert got.get("s2") is None
    assert abs(got["s1"] - 5000) < 300
    assert abs(got.get("s3", 0) - 1000) < 150
    # deterministic: identical membership run-to-run
    a = sorted(r.k for r in out.collect())
    b = sorted(r.k for r in stratified_sample(
        df, "k", "g", {"s0": 1.0, "s1": 0.5, "s2": 0.0}, default_rate=0.1, seed=3
    ).collect())
    assert a == b


def test_stratified_sample_matches_duckdb_twin(spark):
    import duckdb
    import pyspark.sql.functions as F
    from graftlink.sampling import stratified_sample, stratified_sample_sql

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("g"),
    )
    got = sorted(r.k for r in stratified_sample(
        df, "k", "g", {"s0": 0.25, "s1": 0.75}, default_rate=0.05, seed=9
    ).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range AS k, 's' || (range % 3) AS g FROM range(5000)")
    want = [
        r[0]
        for r in con.execute(
            stratified_sample_sql(
                "SELECT k, g FROM t", "k", "g",
                {"s0": 0.25, "s1": 0.75}, default_rate=0.05, seed=9,
            ) + " ORDER BY k"
        ).fetchall()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# weighted walks (igraph random_walk(weights=))
# ---------------------------------------------------------------------------


def _replay_weighted(wedges, starts, steps):
    """Pure-Python replay of the inverse-CDF rule."""
    from collections import defaultdict

    adj = defaultdict(dict)
    for s, d, w in wedges:
        if s != d:
            adj[s][d] = adj[s].get(d, 0) + int(w)
    want = set()
    for w0 in starts:
        cur = w0
        want.add((w0, 0, cur))
        for t in range(1, steps + 1):
            nbrs = sorted(adj.get(cur, {}).items())
            if not nbrs:
                break
            tot = sum(x for _, x in nbrs)
            h = ((w0 % P) * A1 + (t % P) * A2 + (cur % P) * A3 + C) % P
            r = h % tot
            run = 0
            for d, ww in nbrs:
                run += ww
                if run > r:
                    cur = d
                    break
            want.add((w0, t, cur))
    return want


def _wdf(spark, wedges):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in wedges],
        "src long, dst long, weight long",
    )


def test_weighted_walks_match_python_replay(spark):
    from graftlink.walks import weighted_random_walks

    rnd = random.Random(4)
    wedges = [(a, b, rnd.randrange(1, 6)) for a, b in _er_pairs(30, 120, seed=4)]
    starts = [0, 3, 11, 19]
    got = {
        (r.walk, r.step, r.vertex)
        for r in weighted_random_walks(_wdf(spark, wedges), starts, 8).collect()
    }
    assert got == _replay_weighted(wedges, starts, 8)


def test_weighted_walks_proportional_choice(spark):
    """Empirical next-hop frequency tracks w/W: from vertex 0 with
    out-weights {1: 1, 2: 3}, ~3/4 of many independent walkers step
    to 2 (hash-uniformity over walk ids)."""
    from graftlink.walks import weighted_random_walks

    e = _wdf(spark, [(0, 1, 1), (0, 2, 3), (1, 0, 1), (2, 0, 1)])
    starts = spark.createDataFrame(
        [(i, 0) for i in range(400)], "walk long, vertex long"
    )
    first = {
        r.walk: r.vertex
        for r in weighted_random_walks(e, starts, 1).collect()
        if r.step == 1
    }
    share2 = sum(1 for v in first.values() if v == 2) / len(first)
    assert 0.68 <= share2 <= 0.82, share2


def test_weighted_walks_parallel_edges_merge_and_sink(spark):
    from graftlink.walks import weighted_random_walks

    # 0's only neighbor is 1 (two parallel edges), 1 is a sink
    e = _wdf(spark, [(0, 1, 1), (0, 1, 2)])
    got = sorted(
        (r.walk, r.step, r.vertex)
        for r in weighted_random_walks(e, [0], 5).collect()
    )
    assert got == [(0, 0, 0), (0, 1, 1)]
