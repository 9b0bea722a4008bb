"""Biconnected components + articulation points — Tarjan–Vishkin.

igraph surface matched: `igraph_biconnected_components` /
`igraph_articulation_points` (python `Graph.biconnected_components()`,
`Graph.articulation_points()`; igraph@0.10.x src/connectivity/
separators.c + components.c [unverified file] use a sequential DFS
low-point pass, which is BSP-hostile).

Distributed formulation (Tarjan & Vishkin 1985, "An efficient parallel
biconnectivity algorithm" — the classic reduction of biconnectivity to
CONNECTIVITY, which this engine already owns):

  1. Deterministic BFS spanning forest (shared with bridges():
     min-id roots, min-parent ties).
  2. Rooted-forest labels, all by level-synchronous supersteps:
       size(v)   bottom-up  (1 + sum of child sizes)
       pre(v)    top-down   (pre(parent) + 1 + sum of earlier-sibling
                  sizes; siblings ordered by id -> deterministic).
                  subtree(v) == the interval [pre(v), pre(v)+size(v)),
                  valid per component (pre restarts at 0 per root; all
                  comparisons stay inside one component).
       low/high(v) bottom-up (min/max pre-order over subtree(v)'s
                  vertices and the far endpoints of non-tree edges
                  leaving subtree(v)).
  3. Auxiliary graph on the NON-ROOT vertices (vertex v stands for its
     parent tree edge (p(v), v)):
       rule i  — tree edge (u,v), u non-root: aux edge {u, v} iff
                 low(v) < pre(u) OR high(v) >= pre(u) + size(u)
                 (some non-tree edge escapes subtree(u) from inside
                 subtree(v), closing a cycle through both tree edges);
       rule ii — non-tree edge {x, y} with x, y interval-unrelated:
                 aux edge {x, y} (the closed cycle contains both
                 parent edges).  Non-tree edges never touch a root
                 (every root-incident edge is a tree edge by BFS), and
                 ancestor-related non-tree edges are covered by rule i
                 chaining along the tree path.
  4. Biconnected components = connected components of the aux graph
     (renumber=False -> block id = min member child-vertex id,
     deterministic).  A tree edge's block is its child's component; a
     non-tree edge belongs to the block of its deeper (greater-pre)
     endpoint.
  5. #blocks containing v = #distinct blocks over v's incident TREE
     edges (every non-tree edge at v shares a cycle — hence a block —
     with one of v's tree edges).  v is an articulation point iff that
     count >= 2.  This equals #connected components of G - v that
     contain a neighbor of v, which is exactly the algorithm-
     independent statistic the DuckDB twin computes
     (iterative_sql.vertex_block_counts_sql).

Blocks and articulation points are invariant under edge multiplicity
and self-loops, so the kernel runs on the canonical simple view.

Shape at 100 TB: the forest BFS is the engine's standard frontier loop;
each label pass is depth supersteps over level-sized frames that touch
every vertex once in total (hash joins + partial aggs, localCheckpoint
per level); the one Window (earlier-sibling prefix sums, partitioned by
parent) sorts only within each parent's child list — a hub with k
children costs one k-row in-task sort, not a global sort; the aux graph
has <= |E| edges and CC over it is the engine's own star kernel.  No
driver-side row loops; the only collect is the scalar depth counter
inside the shared BFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graftlink.bridges import canonical_simple, spanning_forest


def _levels(d: DataFrame, maxlvl: int):
    """Split the forest frame into per-level lists once; every pass
    below walks these."""
    return [d.where(F.col("dist") == lvl) for lvl in range(maxlvl + 1)]


def _tarjan_vishkin(
    edges: DataFrame,
    max_depth: int = 300,
    buckets: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (edge_blocks DF[a, b, block], tree DF[child, parent, block]).

    edge_blocks covers every canonical simple edge; block is the min
    child-vertex id of the biconnected component (deterministic)."""
    from graftlink.components import connected_components

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))

    simple = canonical_simple(edges, b).persist()
    und = simple.select("a", "b")
    d, maxlvl = spanning_forest(und, b, max_depth, tag="biconn-bfs")
    lv = _levels(d, maxlvl)

    tree = d.where(F.col("parent").isNotNull()).select(
        F.least("parent", "id").alias("a"),
        F.greatest("parent", "id").alias("b"),
        F.col("parent"),
        F.col("id").alias("child"),
    )
    nontree = und.join(tree.select("a", "b"), ["a", "b"], "left_anti").persist()

    # ---- size(v): bottom-up ------------------------------------------------
    sizes = []  # per-level DF[id, parent, size]
    carry = None  # DF[id(=parent), s] finished child sizes
    for lvl in range(maxlvl, -1, -1):
        cur = lv[lvl].select("id", "parent")
        if carry is not None:
            cs = carry.groupBy("id").agg(F.sum("s").alias("cs"))
            cur = cur.join(cs.hint("shuffle_hash"), "id", "left").select(
                "id", "parent", (F.coalesce("cs", F.lit(0)) + 1).alias("size")
            )
        else:
            cur = cur.select("id", "parent", F.lit(1).cast("long").alias("size"))
        cur = cur.localCheckpoint(eager=True)
        sizes.append(cur)
        carry = cur.where(F.col("parent").isNotNull()).select(
            F.col("parent").alias("id"), F.col("size").alias("s")
        )
    size_all = sizes[0]
    for s in sizes[1:]:
        size_all = size_all.unionByName(s)

    # ---- pre(v): earlier-sibling offsets, then top-down --------------------
    w = (
        Window.partitionBy("parent")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    childoff = (
        size_all.where(F.col("parent").isNotNull())
        .withColumn("off", F.coalesce(F.sum("size").over(w), F.lit(0)))
        .persist()
    )
    pres = [
        lv[0].select("id", F.lit(0).cast("long").alias("pre")).localCheckpoint(
            eager=True
        )
    ]
    for lvl in range(1, maxlvl + 1):
        prev = pres[-1].select(F.col("id").alias("_p"), F.col("pre").alias("_pp"))
        cur = (
            lv[lvl]
            .select("id", "parent")
            .join(childoff.select("id", "off"), "id")
            .join(prev.hint("shuffle_hash"), F.col("parent") == F.col("_p"))
            .select("id", (F.col("_pp") + 1 + F.col("off")).alias("pre"))
            .localCheckpoint(eager=True)
        )
        pres.append(cur)
    pre_all = pres[0]
    for p in pres[1:]:
        pre_all = pre_all.unionByName(p)
    # one frame with everything the interval tests need
    lab = (
        d.select("id", "dist", "parent")
        .join(pre_all, "id")
        .join(size_all.select("id", "size"), "id")
        .repartition(b, "id")
        .persist()
    )

    # ---- low/high(v): non-tree reach, then bottom-up -----------------------
    pa = lab.select(F.col("id").alias("_a"), F.col("pre").alias("pre_a"))
    pb = lab.select(F.col("id").alias("_b"), F.col("pre").alias("pre_b"))
    ntp = (
        nontree.join(pa, nontree["a"] == pa["_a"])
        .join(pb, nontree["b"] == pb["_b"])
        .select("a", "b", "pre_a", "pre_b")
        .persist()
    )
    reach = (
        ntp.select(F.col("a").alias("id"), F.col("pre_b").alias("r"))
        .unionAll(ntp.select(F.col("b").alias("id"), F.col("pre_a").alias("r")))
        .groupBy("id")
        .agg(F.min("r").alias("rlo"), F.max("r").alias("rhi"))
    )
    lows = []  # per-level DF[id, parent, lo, hi]
    carry = None  # DF[id(=parent), clo, chi]
    for lvl in range(maxlvl, -1, -1):
        cur = (
            lab.where(F.col("dist") == lvl)
            .select("id", "parent", "pre")
            .join(reach.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                "parent",
                F.least("pre", F.coalesce("rlo", F.col("pre"))).alias("lo"),
                F.greatest("pre", F.coalesce("rhi", F.col("pre"))).alias("hi"),
            )
        )
        if carry is not None:
            cc = carry.groupBy("id").agg(
                F.min("clo").alias("clo"), F.max("chi").alias("chi")
            )
            cur = cur.join(cc.hint("shuffle_hash"), "id", "left").select(
                "id",
                "parent",
                F.least("lo", F.coalesce("clo", F.col("lo"))).alias("lo"),
                F.greatest("hi", F.coalesce("chi", F.col("hi"))).alias("hi"),
            )
        cur = cur.localCheckpoint(eager=True)
        lows.append(cur)
        carry = cur.where(F.col("parent").isNotNull()).select(
            F.col("parent").alias("id"),
            F.col("lo").alias("clo"),
            F.col("hi").alias("chi"),
        )
    low_all = lows[0]
    for x in lows[1:]:
        low_all = low_all.unionByName(x)

    # ---- aux graph ----------------------------------------------------------
    # rule i: tree edge (u, v), u non-root
    uinfo = lab.where(F.col("parent").isNotNull()).select(
        F.col("id").alias("_u"), F.col("pre").alias("pre_u"), F.col("size").alias("size_u")
    )
    vlow = low_all.select(F.col("id").alias("_v"), "lo", "hi")
    aux_i = (
        tree.select(F.col("parent").alias("u"), F.col("child").alias("v"))
        .join(uinfo, F.col("u") == F.col("_u"))
        .join(vlow, F.col("v") == F.col("_v"))
        .where(
            (F.col("lo") < F.col("pre_u"))
            | (F.col("hi") >= F.col("pre_u") + F.col("size_u"))
        )
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    # rule ii: unrelated non-tree edges (interval containment test)
    sa = lab.select(F.col("id").alias("_sa"), F.col("size").alias("size_a"))
    sb = lab.select(F.col("id").alias("_sb"), F.col("size").alias("size_b"))
    aux_ii = (
        ntp.join(sa, ntp["a"] == sa["_sa"])
        .join(sb, ntp["b"] == sb["_sb"])
        .where(
            ~(
                (F.col("pre_a") <= F.col("pre_b"))
                & (F.col("pre_b") < F.col("pre_a") + F.col("size_a"))
            )
            & ~(
                (F.col("pre_b") <= F.col("pre_a"))
                & (F.col("pre_a") < F.col("pre_b") + F.col("size_b"))
            )
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    aux = aux_i.unionByName(aux_ii)
    blocks = connected_components(
        aux,
        vertices=tree.select(F.col("child").alias("id")),
        renumber=False,
        buckets=b,
    ).select(F.col("id").alias("child"), F.col("component").alias("block"))

    tree_blocks = (
        tree.select("child", "parent").join(blocks, "child").persist()
    )

    # ---- per-edge block assignment ------------------------------------------
    tree_edges = tree_blocks.select(
        F.least("parent", "child").alias("a"),
        F.greatest("parent", "child").alias("b"),
        "block",
    )
    deeper = ntp.select(
        "a",
        "b",
        F.when(F.col("pre_a") >= F.col("pre_b"), F.col("a"))
        .otherwise(F.col("b"))
        .alias("child"),
    )
    nontree_edges = deeper.join(blocks, "child").select("a", "b", "block")
    edge_blocks = tree_edges.unionByName(nontree_edges)

    simple.unpersist()
    nontree.unpersist()
    childoff.unpersist()
    ntp.unpersist()
    lab.unpersist()
    d.unpersist()
    return edge_blocks, tree_blocks


def biconnected_components(
    edges: DataFrame, max_depth: int = 300, buckets: int | None = None
) -> DataFrame:
    """DF[a, b, block] — every simple undirected edge labeled with its
    biconnected component; block = min non-root member vertex id."""
    edge_blocks, _ = _tarjan_vishkin(edges, max_depth, buckets)
    return edge_blocks


def vertex_block_counts(
    edges: DataFrame, max_depth: int = 300, buckets: int | None = None
) -> DataFrame:
    """DF[id, n_blocks] for every non-isolated vertex: the number of
    biconnected components containing id == the number of connected
    components of G - id that contain a neighbor of id (the removal
    statistic the DuckDB twin computes)."""
    _, tree_blocks = _tarjan_vishkin(edges, max_depth, buckets)
    incident = tree_blocks.select(F.col("child").alias("id"), "block").unionAll(
        tree_blocks.select(F.col("parent").alias("id"), "block")
    )
    return incident.groupBy("id").agg(
        F.countDistinct("block").alias("n_blocks")
    )


def articulation_points(
    edges: DataFrame, max_depth: int = 300, buckets: int | None = None
) -> DataFrame:
    """DF[id] — vertices whose removal increases the component count
    (igraph_articulation_points)."""
    return (
        vertex_block_counts(edges, max_depth, buckets)
        .where(F.col("n_blocks") >= 2)
        .select("id")
    )
