"""Bipartite surface: two-coloring check + two-mode projection.

igraph surface matched: `igraph_is_bipartite` (which also emits the
per-vertex type vector) and `igraph_bipartite_projection`
(igraph@0.10.x src/misc/bipartite.c [unverified file]).

igraph's is_bipartite runs a sequential BFS two-coloring; the
distributed form here is the engine's standard frontier superstep:

1. component labels via the engine's own CC kernel (renumber=False,
   so label = min vertex id of the component);
2. ONE batched BFS from every component's min-id root — components
   are disjoint, so the waves never interact and the state stays
   exactly n rows (id, side), not (source, id);
3. side(v) = BFS depth parity. The graph is bipartite iff no edge
   joins two vertices of equal parity, and when it is, `side` IS the
   canonical type vector (igraph's `type` output, rooted
   deterministically at the component min id — a pure function of the
   graph, unlike igraph's traversal-order-dependent coloring, which
   is only unique up to per-component flips anyway).

The projection is the cocitation wedge plan (linkpred._pair_counts
shape): incidence self-join keyed on the left vertex, one shuffle,
partial-agg reduce. `max_left_degree` is the same declared hub cap as
cocitation's `max_center_degree` — a left vertex of degree d emits
C(d,2) pairs, so at 100 TB you cap the few degenerate hubs (an order
containing every part is co-purchase noise, not signal) and the cap
is part of the operator's contract, replayed verbatim by the twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.checkpoint import CheckpointManager


def _und_simple(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def bipartite_sides(
    edges: DataFrame,
    max_rounds: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, side] — side = parity of the BFS depth from the vertex's
    component root (root = component min id, side 0). Defined for ANY
    graph; it is a valid 2-coloring iff the graph is bipartite
    (igraph_is_bipartite's type vector)."""
    from graftlink.components import connected_components

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = _und_simple(edges)
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    comp = connected_components(edges, renumber=False)
    roots = comp.where(F.col("id") == F.col("component")).select("id")

    adj = pack_adjacency(sym, buckets=b).persist()
    mgr = CheckpointManager(None, "bipartite", spark, mode="local", buckets=b)

    # bfs_distances' loop shape verbatim, seeded from a DataFrame of
    # roots instead of one literal source (component count can be
    # huge at scale — the roots never touch the driver)
    visited = roots.withColumn("dist", F.lit(0).cast("int")).repartition(b, "id")
    frontier = visited
    for depth in range(1, max_rounds + 1):
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
        frontier = visited.where(F.col("dist") == depth)
    result = mgr.finalize(
        visited.select("id", (F.col("dist") % 2).cast("int").alias("side"))
    )
    adj.unpersist()
    return result


def bipartite_check(edges: DataFrame, buckets: int | None = None) -> DataFrame:
    """One-row DF[odd_edges, is_bipartite] — odd_edges = undirected
    simple edges whose endpoints share a BFS-parity side (0 iff
    bipartite; igraph_is_bipartite's boolean)."""
    sides = bipartite_sides(edges, buckets=buckets)
    und = _und_simple(edges)
    sa = sides.select(F.col("id").alias("a"), F.col("side").alias("_sa"))
    sb = sides.select(F.col("id").alias("b"), F.col("side").alias("_sb"))
    return (
        und.join(sa, "a")
        .join(sb, "b")
        .agg(
            F.sum((F.col("_sa") == F.col("_sb")).cast("long")).alias("odd_edges"),
            (F.sum((F.col("_sa") == F.col("_sb")).cast("long")) == 0).alias(
                "is_bipartite"
            ),
        )
    )


def bipartite_projection(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    max_left_degree: int | None = None,
) -> DataFrame:
    """DF[a, b, weight] (a < b over right-vertex ids) — the one-mode
    projection of the two-mode graph onto its RIGHT vertex class:
    weight = number of distinct left vertices adjacent to both
    (igraph_bipartite_projection with multiplicity=true). Project onto
    the left class by swapping the column arguments."""
    inc = pairs.select(
        F.col(left_col).alias("c"), F.col(right_col).alias("x")
    ).distinct()
    if max_left_degree is not None:
        keep = (
            inc.groupBy("c")
            .agg(F.count("*").alias("_d"))
            .where(F.col("_d") <= max_left_degree)
            .select("c")
        )
        inc = inc.join(keep, "c", "left_semi")
    left = inc.select("c", F.col("x").alias("a"))
    right = inc.select("c", F.col("x").alias("b"))
    return (
        left.join(right, "c")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("weight"))
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def _sides_cte(clean: str, max_rounds: int = 300) -> str:
    """Shared CTE body: per-vertex (id, side) via min-label component
    roots + min-distance parity — algorithm-independent (closure
    built directly), so it checks the SEMANTICS of the superstep."""
    return f"""
        clean AS ({clean}),
        verts AS (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM clean UNION ALL SELECT dst FROM clean
            )
        ),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM clean WHERE src <> dst
        ),
        nb AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
        reach(id, r) AS (
            SELECT id, id FROM verts
            UNION
            SELECT n.v, rc.r FROM reach rc JOIN nb n ON n.u = rc.id
        ),
        lab AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
        d(id, dist) AS (
            SELECT id, 0 FROM lab WHERE id = root
            UNION
            SELECT n.v, dd.dist + 1
            FROM d dd JOIN nb n ON n.u = dd.id
            WHERE dd.dist < {max_rounds}
        ),
        sides AS (
            SELECT id, CAST(min(dist) % 2 AS INT) AS side FROM d GROUP BY id
        )
    """


def bipartite_sides_sql(clean: str) -> str:
    return f"""
        WITH RECURSIVE
        {_sides_cte(clean)}
        SELECT id, side FROM sides
    """


def bipartite_check_sql(clean: str) -> str:
    return f"""
        WITH RECURSIVE
        {_sides_cte(clean)}
        SELECT count(*) FILTER (WHERE sa.side = sb.side) AS odd_edges,
               count(*) FILTER (WHERE sa.side = sb.side) = 0 AS is_bipartite
        FROM und
        JOIN sides sa ON sa.id = und.a
        JOIN sides sb ON sb.id = und.b
    """


def bipartite_projection_sql(
    pairs_sql: str, max_left_degree: int | None = None
) -> str:
    cap = (
        f"""
        , capped AS (
            SELECT c, x FROM inc
            WHERE c IN (
                SELECT c FROM inc GROUP BY c
                HAVING count(*) <= {max_left_degree}
            )
        )
        """
        if max_left_degree is not None
        else ", capped AS (SELECT c, x FROM inc)"
    )
    return f"""
        WITH inc AS (SELECT DISTINCT c, x FROM ({pairs_sql}))
        {cap}
        SELECT l.x AS a, r.x AS b, count(*) AS weight
        FROM capped l JOIN capped r ON l.c = r.c AND l.x < r.x
        GROUP BY l.x, r.x
    """
