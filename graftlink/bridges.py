"""Bridges (cut edges) — spanning-forest + XOR edge-covering.

igraph surface matched: `igraph_bridges` / python `Graph.bridges()`
(igraph@0.10.x src/connectivity/bridges.c [unverified file]; igraph
uses a sequential DFS low-link pass, which is BSP-hostile — the
distributed formulation below returns the same edge set).

Algorithm (any-spanning-tree cycle-space argument, the parallel
folklore XOR trick used by e.g. the AKS/KKT MST verification line):

  1. BFS spanning FOREST from the min-id root of every component
     (min-parent tie-break -> the forest is a deterministic function
     of the graph, independent of partitioning).
  2. Every NON-tree simple edge e=(u,v) closes exactly one cycle:
     the u..v tree path.  Give e a fixed nonzero 61-bit key h(e) and
     XOR it into both endpoints' accumulators x(u), x(v).
  3. Subtree-XOR bottom-up over the forest:
     S(child edge c) = XOR of x(w) over w in subtree(c).  The two
     endpoint contributions of a non-tree edge cancel at and above
     their meet vertex, so S(c) = XOR of h(e) over exactly the
     non-tree edges whose cycle covers c.
  4. A tree edge is a bridge iff NO non-tree edge covers it, i.e.
     S(c) == 0 (and its multiplicity is 1 — a doubled edge is its own
     cycle); non-tree edges are never bridges.

Exactness: S(c)==0 is exact when no covering set XORs to zero; keys
are fixed multiply-mod-P mixes of the endpoint ids spread over 61
bits, so a false bridge needs a ~2^-61 structured collision — and
because the DuckDB twin computes the SAME statistic from the SAME
keys, cross-engine hash parity is exact regardless.  (igraph's DFS is
deterministic-exact; the pytest gate compares against networkx
`bridges` on every fixture, which would surface a collision.)

Shape at 100 TB: the forest BFS is the engine's standard frontier
loop (depth supersteps, one partial-agg shuffle each — web graphs are
shallow); the min-parent pass is the shared `_parent_join` post-pass
(two shuffle_hash joins, no recursion); the endpoint scatter is one
partial-agg groupBy; the bottom-up pass is depth supersteps over
level-sized frames that in total touch each vertex once.  No windows,
no sorts, no driver-side loops over rows; per-level frames
localCheckpoint (they are the next superstep's join input), bridge
rows accumulate LAZILY and union once at exit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager

# Same multiply-mod-P mix as graftlink.mis (kept literal here so the
# edge-key spec is readable in one place and in the SQL twin).
_P = 1_000_000_007
_A = 2_654_435_761 % _P
_C = 824_633_702


def _mix(col):
    return F.pmod(F.pmod(col, F.lit(_P)) * F.lit(_A) + F.lit(_C), F.lit(_P))


def _edge_key(a, b):
    """Deterministic nonzero 61-bit key of an undirected simple edge:
    mix(a) placed in the high 31 bits, mix(b) low (+1 so the key is
    never zero; mix() < 2^30 so no overflow/sign issues)."""
    return _mix(a) * F.lit(2_147_483_648) + _mix(b) + F.lit(1)


def edge_key_sql(a: str, b: str) -> str:
    """DuckDB twin of _edge_key (identical integer arithmetic)."""
    mix = "((CAST({x} AS BIGINT) % {p}) * {m} + {c}) % {p}"
    ma = mix.format(x=a, p=_P, m=_A, c=_C)
    mb = mix.format(x=b, p=_P, m=_A, c=_C)
    return f"(({ma}) * 2147483648 + ({mb}) + 1)"


def canonical_simple(edges: DataFrame, buckets: int) -> DataFrame:
    """DF[a, b, mult] — canonical simple undirected view (a < b,
    self-loops dropped, parallel edges collapsed into a multiplicity)."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("mult"))
        .repartition(buckets, "a")
    )


def spanning_forest(
    und: DataFrame,
    buckets: int,
    max_depth: int = 300,
    tag: str = "forest-bfs",
) -> tuple[DataFrame, int]:
    """und DF[a, b] (simple, a < b) -> (DF[id, dist, parent], maxlvl):
    a deterministic BFS spanning forest rooted at the min-id vertex of
    every component, with the min-predecessor parent tie-break — a pure
    function of the graph, independent of partitioning and superstep
    order. Shared by bridges() and the Tarjan–Vishkin biconnectivity
    kernel. The returned frame is persisted; callers unpersist."""
    from graftlink.components import connected_components
    from graftlink.paths import _parent_join

    spark = und.sparkSession
    b = buckets

    # ---- BFS forest from the min-id root of every component ----
    roots = (
        connected_components(und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
                             renumber=False)
        .select(F.col("component").alias("id"))
        .distinct()
    )
    adj = pack_adjacency(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        buckets=b, undirected=True,
    ).persist()
    mgr = CheckpointManager(None, tag, spark, mode="local", buckets=b)
    visited = roots.select("id", F.lit(0).cast("int").alias("dist")).repartition(
        b, "id"
    )
    frontier = visited
    maxlvl = 0
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"], "inner")
            .select(F.explode("neighbors").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
        )
        visited, row = mgr.save(
            visited.unionByName(nxt), depth, "id", counters={"depth": depth},
            stats_cols=[
                F.sum((F.col("dist") == depth).cast("long")).alias("new_count")
            ],
        )
        if not row["new_count"]:
            break
        maxlvl = depth
        frontier = visited.where(F.col("dist") == depth)
    else:
        raise RuntimeError(
            f"{tag}: forest BFS still growing at max_depth={max_depth}; "
            f"raise max_depth (graph eccentricity exceeds it)"
        )
    adj.unpersist()
    visited = mgr.finalize(visited)

    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    d = _parent_join(sym, visited, F.lit(1)).repartition(b, "id").persist()
    return d, maxlvl


def bridges(
    edges: DataFrame,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """DF[a, b] — every bridge of the undirected multigraph view of
    `edges` (a < b; an edge is a bridge iff removing it increases the
    component count; parallel edges cover each other, self-loops are
    never bridges)."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))

    simple = canonical_simple(edges, b).persist()
    und = simple.select("a", "b")

    d, maxlvl = spanning_forest(und, b, max_depth, tag="bridges-bfs")

    # ---- 2. non-tree edges scatter their key into both endpoints ----
    tree = d.where(F.col("parent").isNotNull()).select(
        F.least("parent", "id").alias("a"),
        F.greatest("parent", "id").alias("b"),
        F.col("id").alias("child"),
    )
    nontree = und.join(tree.select("a", "b"), ["a", "b"], "left_anti")
    xdf = (
        nontree.select(F.col("a").alias("id"), _edge_key(F.col("a"), F.col("b")).alias("h"))
        .unionAll(
            nontree.select(F.col("b").alias("id"), _edge_key(F.col("a"), F.col("b")).alias("h"))
        )
        .groupBy("id")
        .agg(F.expr("bit_xor(h)").alias("x"))
    )

    # ---- 3./4. bottom-up subtree XOR, bridge test per level ----
    carry = None  # DF[id, c]: finished-subtree XORs addressed to the parent
    parts: list[DataFrame] = []
    schema = "a long, b long"
    for lvl in range(maxlvl, 0, -1):
        s = (
            d.where(F.col("dist") == lvl)
            .select("id", "parent")
            .join(xdf.hint("shuffle_hash"), "id", "left")
            .select("id", "parent", F.coalesce("x", F.lit(0)).alias("x"))
        )
        if carry is not None:
            cx = carry.groupBy("id").agg(F.expr("bit_xor(c)").alias("cx"))
            s = s.join(cx.hint("shuffle_hash"), "id", "left").select(
                "id",
                "parent",
                F.col("x").bitwiseXOR(F.coalesce("cx", F.lit(0))).alias("x"),
            )
        s = s.localCheckpoint(eager=True)
        parts.append(
            s.where(F.col("x") == 0).select(
                F.least("id", "parent").alias("a"),
                F.greatest("id", "parent").alias("b"),
            )
        )
        carry = s.select(F.col("parent").alias("id"), F.col("x").alias("c"))
    if not parts:
        return spark.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    result = out.join(simple.where(F.col("mult") == 1).select("a", "b"), ["a", "b"])
    return result.select("a", "b")
