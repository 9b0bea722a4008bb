"""Dominator tree — immediate dominators of every vertex reachable
from a root in a directed graph (round-4 verdict Missing #3).

igraph surface matched: igraph_dominator_tree / python
`Graph.dominator(root)` (igraph@0.10.x src/flow/dominator_tree.c
implements Lengauer–Tarjan [public anchor; NOT a port — LT's DFS +
path-compressed link-eval forest is inherently sequential]). This is
the iterative-dataflow form instead (Allen–Cocke dominator dataflow,
Cooper–Harvey–Kennedy 2001 "A Simple, Fast Dominance Algorithm"
restated for synchronous/Jacobi rounds):

    Dom(v) = {v} ∪ ⋂_{p ∈ preds(v)} Dom(p)        (greatest fixpoint)

with Dom-sets represented as chains of an idom forest and the
intersection computed as the nearest-common-ancestor of preds(v) in
the current forest, using BFS DEPTH as the CHK "finger" order:

- every dominator of v lies on EVERY root→v path, including the BFS
  tree path, so the BFS-tree parent chain over-approximates Dom(v) —
  a valid (⊇) initialization above the greatest fixpoint;
- forest edges strictly decrease BFS depth (a dominator sits on a
  shortest path, so depth(idom(v)) < depth(v)), so the NCA walk
  "step every deepest climber up one idom edge" terminates and the
  invariant is preserved by each Jacobi update (the BFS-tree parent
  is always among the climbers, and NCA is its forest
  ancestor-or-self);
- updates are monotone in the ⊇ lattice, so the Jacobi iteration
  descends to the greatest fixpoint — the dominator relation — on
  reducible AND irreducible graphs (pytest: networkx
  `immediate_dominators` parity on ER digraphs, nested/irreducible
  loops, and the doc-edges fixture).

Scale shape: state is DF[v, climber] (≤ one row per edge, shrinking
as NCAs resolve); each inner NCA round is one shuffle_hash join
against the n-sized idom table + one partial-agg max/count groupBy —
no Window, no sort, no Python. Outer (Jacobi) rounds are few (2-3 on
web graphs); inner rounds are bounded by the BFS depth. All loop
joins carry shuffle_hash hints (the b74526f discipline) and per-round
state goes through CheckpointManager (kill-resume pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.checkpoint import CheckpointManager


def dominator_tree(
    edges: DataFrame,
    root: int,
    max_rounds: int = 50,
    max_inner: int = 10_000,
    buckets: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    fingerprint: str = "",
) -> DataFrame:
    """DF[id, idom] — immediate dominator of every vertex reachable
    from `root` (root row carries idom NULL; unreachable vertices are
    absent, igraph's convention of excluding them from the tree)."""
    from graftlink.paths import bfs_parents

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    mgr = CheckpointManager(
        checkpoint_dir, "domtree", spark, input_fingerprint=fingerprint, buckets=b
    )

    start_round = 0
    idom = None
    depth = None
    preds = None
    if resume and checkpoint_dir is not None:
        found = mgr.latest()
        if found is not None:
            start_round = found[0] + 1
            idom = mgr.load(found[0], "id").localCheckpoint(eager=True)
    # BFS depth + tree parent = the ⊇ initialization (recomputed on
    # resume: a pure function of (edges, root), cheaper than storing)
    bp = (
        bfs_parents(edges, root, directed=True)
        .where(F.col("dist").isNotNull())
        .select("id", F.col("dist").cast("long").alias("depth"), "parent")
        .localCheckpoint(eager=True)
    )
    depth = bp.select("id", "depth").repartition(b, "id").localCheckpoint(eager=True)
    reach = bp.select("id")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .join(reach.withColumnRenamed("id", "src").hint("shuffle_hash"),
              "src", "left_semi")
        .join(reach.withColumnRenamed("id", "dst").hint("shuffle_hash"),
              "dst", "left_semi")
        .where(F.col("dst") != F.lit(root))
        .localCheckpoint(eager=True)
    )
    if idom is None:
        idom = (
            bp.where(F.col("id") != F.lit(root))
            .select("id", F.col("parent").alias("idom"))
            .repartition(b, "id")
            .localCheckpoint(eager=True)
        )

    dep_a = depth.select(F.col("id").alias("a"), F.col("depth").alias("_da"))
    for rnd in range(start_round, max_rounds):
        # ---- inner: NCA of preds(v) in the current idom forest ----
        climb = (
            e.select(F.col("dst").alias("v"), F.col("src").alias("a"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        fwd = idom.select(F.col("id").alias("a"), F.col("idom").alias("_up"))
        for _ in range(max_inner):
            st = climb.join(dep_a.hint("shuffle_hash"), "a")
            agg = st.groupBy("v").agg(
                F.max("_da").alias("_dmax"),
                F.count("*").alias("_nc"),
            )
            live = st.join(agg.hint("shuffle_hash"), "v").where(F.col("_nc") > 1)
            if live.isEmpty():
                break
            stepped = (
                live.join(fwd.hint("shuffle_hash"), "a", "left")
                .select(
                    "v",
                    F.when(
                        F.col("_da") == F.col("_dmax"),
                        F.coalesce("_up", F.col("a")),
                    ).otherwise(F.col("a")).alias("a"),
                )
                .unionByName(
                    st.join(agg.hint("shuffle_hash"), "v")
                    .where(F.col("_nc") == 1)
                    .select("v", "a")
                )
                .distinct()
            )
            climb = stepped.localCheckpoint(eager=True)
        else:
            raise RuntimeError(
                f"dominator NCA did not resolve in {max_inner} inner rounds"
            )
        new_idom = climb.select(F.col("v").alias("id"), F.col("a").alias("idom"))
        merged = idom.join(
            new_idom.withColumnRenamed("idom", "_ni").hint("shuffle_hash"),
            "id", "left",
        ).select(
            "id",
            F.coalesce("_ni", F.col("idom")).alias("idom"),
            F.col("idom").alias("_prev"),
        )
        saved, row = mgr.save(
            merged, rnd, "id", counters={"round": rnd},
            stats_cols=[
                F.sum((F.col("idom") != F.col("_prev")).cast("long")).alias("changed")
            ],
        )
        idom = saved.select("id", "idom")
        if not row["changed"]:
            break
    else:
        raise RuntimeError(
            f"dominator dataflow did not converge in {max_rounds} rounds"
        )
    spark_root = spark.createDataFrame(
        [(int(root), None)], "id long, idom long"
    )
    return mgr.finalize(idom.unionByName(spark_root))


def dominator_tree_sql(clean: str, root: int, max_depth: int = 64) -> str:
    """DuckDB twin — algorithm-independent removal definition:
    u dominates v  <=>  v is unreachable from root in G − {u};
    idom(v) = the strict dominator of MAXIMUM BFS depth (dominators
    of v form a chain, so the argmax is unique). One recursive CTE
    computes reachability with every candidate u removed in parallel
    (state = (removed, vertex) pairs); a second computes BFS depth.
    Quadratic state — an oracle, not an engine path."""
    return f"""
        WITH RECURSIVE
        clean AS (SELECT src, dst FROM ({clean}) WHERE src <> dst),
        reach(v) AS (
            SELECT CAST({root} AS BIGINT) AS v
            UNION
            SELECT e.dst FROM reach r JOIN clean e ON e.src = r.v
        ),
        -- UNION (not UNION ALL): dedup on (v, d) keeps the state at
        -- n x max_depth pairs instead of enumerating every path;
        -- max_depth bounds the recursion (generous for the fixtures,
        -- and an under-bound surfaces as missing bfs rows -> a loud
        -- idom NULL mismatch, never a silent wrong answer)
        depth(v, d) AS (
            SELECT CAST({root} AS BIGINT) AS v, 0 AS d
            UNION
            SELECT e.dst, d.d + 1
            FROM depth d JOIN clean e ON e.src = d.v
            WHERE d.d < {max_depth}
        ),
        bfs AS (SELECT v, min(d) AS depth FROM depth GROUP BY v),
        cand AS (SELECT v AS u FROM reach WHERE v <> {root}),
        minus(u, v) AS (
            SELECT u, CAST({root} AS BIGINT) AS v FROM cand
            UNION
            SELECT m.u, e.dst
            FROM minus m JOIN clean e ON e.src = m.v
            WHERE e.dst <> m.u
        ),
        dom AS (
            SELECT c.u, r.v
            FROM cand c
            JOIN reach r ON r.v <> {root} AND r.v <> c.u
            WHERE NOT EXISTS (
                SELECT 1 FROM minus m WHERE m.u = c.u AND m.v = r.v
            )
            UNION ALL
            SELECT CAST({root} AS BIGINT) AS u, r.v
            FROM reach r WHERE r.v <> {root}
        ),
        idom AS (
            SELECT d.v AS id,
                   max_by(d.u, b.depth) AS idom
            FROM dom d JOIN bfs b ON b.v = d.u
            GROUP BY d.v
        )
        SELECT id, idom FROM idom
        UNION ALL
        SELECT CAST({root} AS BIGINT) AS id, CAST(NULL AS BIGINT) AS idom
    """
