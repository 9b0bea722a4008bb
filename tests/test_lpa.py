"""LPA (BASELINE.md row 6): deterministic reproducibility, RAK
fixed-point validity, exact on unambiguous fixtures."""

from collections import Counter, defaultdict

from graftlink.lpa import label_propagation

from tests.conftest import edges_df
from tests.oracles import er_edges, two_cliques_bridge


def _run(spark, pairs, n, **kw):
    e = edges_df(spark, pairs)
    res = label_propagation(
        e, vertices=spark.range(n), checkpoint_mode="local", **kw
    )
    return {r["id"]: r["community"] for r in res.collect()}


def test_two_cliques_two_communities(spark):
    got = _run(spark, two_cliques_bridge(), 10)
    assert len(set(got.values())) == 2
    assert len({got[i] for i in range(5)}) == 1
    assert len({got[i] for i in range(5, 10)}) == 1
    # renumbered densely by min member: clique {0..4} -> 0, {5..9} -> 1
    assert got[0] == 0 and got[5] == 1


def test_deterministic_across_runs(spark):
    pairs = er_edges(40, 0.06, 11)
    a = _run(spark, pairs, 40)
    b = _run(spark, pairs, 40)
    assert a == b


def test_fixed_point_validity(spark):
    """At convergence each vertex's label is a maximal vote in its
    closed neighborhood (our deterministic RAK spec)."""
    pairs = two_cliques_bridge() + [(10, 11), (11, 12), (10, 12)]
    n = 13
    got = _run(spark, pairs, n, renumber=False, max_iter=50)
    nbrs = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    for v in range(n):
        votes = Counter(got[u] for u in nbrs[v])
        votes[got[v]] += 1  # self-vote
        assert votes[got[v]] == max(votes.values()), (v, votes, got[v])


def test_isolate_keeps_own_community(spark):
    got = _run(spark, [(0, 1)], 3)
    assert got[2] not in (got[0],)
    assert got[0] == got[1]
