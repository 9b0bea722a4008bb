"""LPA (BASELINE.md row 6): deterministic reproducibility, RAK
fixed-point validity, exact on unambiguous fixtures."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

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


def test_weighted_all_ones_equals_unweighted(spark):
    """weight_col with all-ones weights must reproduce the unweighted
    labels exactly (the weighted spec degrades cleanly)."""
    from pyspark.sql import functions as F

    from tests.oracles import karate_edges
    from tests.conftest import edges_df

    e = edges_df(spark, karate_edges())
    ew = e.withColumn("weight", F.lit(1.0))
    a = {r.id: r.community for r in label_propagation(e, checkpoint_mode="local").collect()}
    b = {
        r.id: r.community
        for r in label_propagation(
            ew, checkpoint_mode="local", weight_col="weight"
        ).collect()
    }
    assert a == b


def test_weighted_votes_change_outcome_deterministically(spark):
    """Weights must be able to flip the result (here the heavy bridge
    couples its endpoints, which uniform weights never do on this
    fixture), and the weighted run must be reproducible across
    partitionings. Exact per-vertex values are pinned cross-engine by
    the driver's lpa_weighted_communities oracle."""
    from pyspark.sql import functions as F

    from tests.conftest import edges_df

    pairs = [(0, 1), (1, 2), (0, 2), (3, 0), (4, 5), (5, 6), (4, 6), (3, 4)]
    heavy = F.when(
        (F.col("src") == 3) & (F.col("dst") == 4), F.lit(10.0)
    ).otherwise(F.lit(1.0))

    def run(df, **kw):
        return {
            r.id: r.community
            for r in label_propagation(df, checkpoint_mode="local", **kw).collect()
        }

    base = edges_df(spark, pairs)
    unw = run(base)
    wtd = run(base.withColumn("weight", heavy), weight_col="weight")
    wtd2 = run(
        base.repartition(5).withColumn("weight", heavy), weight_col="weight"
    )
    assert wtd == wtd2  # deterministic at any partitioning
    assert wtd != unw  # the heavy edge changed the partition
    # the heavy bridge makes (3,4) swap labels every synchronous round
    # (weight 10 dominates both directions), so the deterministic
    # 20-round state leaves 3 in its own community — pin it exactly
    assert wtd == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 2, 6: 2}
    assert unw == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1}


# ---------------------------------------------------------------------------
# semi-supervised surface: initial= / fixed=
# ---------------------------------------------------------------------------


def test_lpa_fixed_labels_never_change(spark):
    from graftlink.lpa import label_propagation

    # path graph 0-1-2-3-4-5, ends seeded+fixed with NEGATIVE labels
    # (the spec's ties-to-min means only labels below the id space
    # propagate through unanimous ties): the two seed labels race
    # toward the middle and the fixpoint splits the path in half
    # (hand-traced: r1 [-2,-2,1,2,-1,-1], r2 [-2,-2,-2,-1,-1,-1],
    # r3 stable)
    e = edges_df(spark, [(i, i + 1) for i in range(5)])
    initial = spark.createDataFrame([(0, -2), (5, -1)], "id long, label long")
    got = {
        r["id"]: r["community"]
        for r in label_propagation(
            e, initial=initial, fixed=initial.select("id"),
            checkpoint_mode="local", renumber=False,
        ).collect()
    }
    assert got[0] == -2 and got[5] == -1
    assert (got[1], got[2], got[3], got[4]) == (-2, -2, -1, -1)


def test_lpa_unfixed_seed_can_be_overrun(spark):
    from graftlink.lpa import label_propagation

    # vertex 0 seeded with a foreign label but NOT fixed, embedded in
    # a clique: the clique majority overruns the seed
    clique = [(i, j) for i in range(4) for j in range(4) if i < j]
    e = edges_df(spark, clique)
    initial = spark.createDataFrame([(0, 999)], "id long, label long")
    got = {
        r["id"]: r["community"]
        for r in label_propagation(
            e, initial=initial, checkpoint_mode="local", renumber=False,
        ).collect()
    }
    assert got[0] != 999


def test_lpa_seeded_defaults_equal_plain(spark):
    from graftlink.lpa import label_propagation
    from tests.oracles import er_edges

    e = edges_df(spark, er_edges(40, 0.12, 9))
    plain = sorted(
        map(tuple, label_propagation(e, checkpoint_mode="local").collect())
    )
    noop = sorted(
        map(
            tuple,
            label_propagation(
                e,
                initial=spark.createDataFrame([], "id long, label long"),
                fixed=spark.createDataFrame([], "id long"),
                checkpoint_mode="local",
            ).collect(),
        )
    )
    assert plain == noop


def test_lpa_seeded_duckdb_twin(spark):
    import duckdb

    from graftlink.iterative_sql import lpa_sql
    from graftlink.lpa import label_propagation
    from graftlink.vertices import vertex_universe
    from tests.oracles import er_edges

    pairs = er_edges(45, 0.1, 4)
    e = edges_df(spark, pairs)
    verts = vertex_universe(e)
    initial = verts.where(F.col("id") % 10 == 0).select(
        "id", (F.col("id") % 20).alias("label")
    )
    sp = sorted(
        map(
            tuple,
            label_propagation(
                e, initial=initial, fixed=initial.select("id"),
                checkpoint_mode="local", max_iter=20,
            ).collect(),
        )
    )
    vals = ",".join(f"({a},{b})" for a, b in pairs)
    clean = f"SELECT * FROM (VALUES {vals}) AS t(src,dst)"
    tw = sorted(
        map(
            tuple,
            duckdb.connect()
            .execute(
                lpa_sql(
                    clean,
                    init_label="CASE WHEN id % 10 = 0 THEN id % 20 ELSE id END",
                    fixed_pred="? % 10 = 0",
                )
            )
            .fetchall(),
        )
    )
    assert sp == tw
