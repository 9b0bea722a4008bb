"""Triangle counting — igraph parity op 4.

Matches igraph_count_adjacent_triangles / igraph_list_triangles
semantics (igraph@0.10.x src/properties/triangles.c): the graph is
viewed undirected, self-loops and duplicate edges ignored; a triangle
is an unordered vertex triple with all three edges.

Spark plan (north_rule names it; = Suri–Vassilvitskii MR pattern):
degree-ordered edge orientation — each undirected edge points from
the endpoint with (degree, id)-lexicographically smaller key to the
larger — bounds every vertex's oriented out-degree by O(sqrt(m)), so
the wedge self-join is near-linear even on power-law graphs (this is
the skew weapon here, not salting). Then one self-join builds wedges
and one join against the oriented edge set closes them. Pure
built-in joins/aggregations, fully whole-stage-codegen, no kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """Dedup to undirected simple edges, then orient by (deg, id)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )


def _closed_triangles(edges: DataFrame) -> DataFrame:
    """DF[u, v, w]: each triangle exactly once (u = pivot, v < w in
    orientation order)."""
    # localCheckpoint, NOT persist: the oriented edge set is read three
    # times below (two wedge sides + the closing join); persist() would
    # stay registered in the cache manager until an explicit unpersist
    # nobody can issue on a lazily-returned DF (round-1 leak), while a
    # localCheckpoint's blocks are dropped by the ContextCleaner as soon
    # as the result DF is garbage-collected.
    o = _oriented(edges).localCheckpoint(eager=True)
    a = o.select(F.col("lo").alias("u"), F.col("hi").alias("x"))
    bdf = o.select(F.col("lo").alias("u"), F.col("hi").alias("y"))
    # unordered out-neighbor pair once per pivot (x < y by id); the
    # closing edge is keyed canonically (min,max) because orientation
    # order is (deg,id), not id
    wedges = a.join(bdf, "u").where(F.col("x") < F.col("y"))
    closing = o.select(
        F.least("lo", "hi").alias("x"), F.greatest("lo", "hi").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"], "inner").select(
        F.col("u"), F.col("x").alias("v"), F.col("y").alias("w")
    )
    return tri


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count (== networkx sum(triangles)/3)."""
    return _closed_triangles(edges).count()


def triangles_per_vertex(
    edges: DataFrame, vertices: DataFrame | None = None
) -> DataFrame:
    """DF[id, triangles] — per-vertex adjacent-triangle counts
    (igraph_count_adjacent_triangles); vertices not in any triangle
    get 0 when a vertex universe is supplied."""
    tri = _closed_triangles(edges)
    corners = (
        tri.select(F.col("u").alias("id"))
        .unionAll(tri.select(F.col("v").alias("id")))
        .unionAll(tri.select(F.col("w").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    if vertices is None:
        from graftlink.vertices import vertex_universe

        vertices = vertex_universe(edges)
    return vertices.select("id").join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def transitivity(edges: DataFrame) -> float:
    """Global clustering coefficient = 3*triangles / wedges
    (igraph_transitivity_undirected)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    wedges = deg.agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")).collect()[
        0
    ]["w"]
    if not wedges:
        return 0.0
    return 3.0 * triangle_count(edges) / float(wedges)

def four_clique_count(edges: DataFrame) -> DataFrame:
    """One-row DF[n_4cliques] — count of K4 subgraphs (igraph
    motif/clique surface: cliques(min=4, max=4) cardinality).

    Same degree-orientation trick as triangles, one join deeper: the
    (deg, id) orientation is a total order, so every K4 has a unique
    source vertex u pointing at the other three; enumerate u's
    oriented out-neighbor triples x < y < z (by id) as a triangle
    (u, x, y) extended by a third out-edge u->z, then close with the
    two remaining undirected edges (x, z) and (y, z). Out-degrees are
    O(sqrt(m))-bounded by the orientation, so the triple expansion is
    near-linear on power-law graphs; every join is an equi-join on
    canonical pair keys (broadcast/SMJ-eligible, no windows)."""
    o = _oriented(edges).localCheckpoint(eager=True)
    closing = o.select(
        F.least("lo", "hi").alias("p"), F.greatest("lo", "hi").alias("q")
    )
    a = o.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    bdf = o.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    tri = (
        a.join(bdf, "u")
        .where(F.col("v") < F.col("w"))
        .join(
            closing.select(F.col("p").alias("v"), F.col("q").alias("w")),
            ["v", "w"],
        )
    )  # (u, v, w): v < w by id, both oriented out-neighbors of u
    third = o.select(F.col("lo").alias("u"), F.col("hi").alias("z"))
    quads = (
        tri.join(third, "u")
        .where(F.col("z") > F.col("w"))
        .join(
            closing.select(F.col("p").alias("v"), F.col("q").alias("z")),
            ["v", "z"],
        )
        .join(
            closing.select(F.col("p").alias("w"), F.col("q").alias("z")),
            ["w", "z"],
        )
    )
    return quads.agg(F.count("*").alias("n_4cliques"))


def four_clique_count_sql(und_sql: str) -> str:
    """DuckDB twin: brute a < b < c < d with all six edges present."""
    return f"""
        WITH und AS ({und_sql})
        SELECT count(*) AS n_4cliques
        FROM und e1
        JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b > e2.b
        JOIN und e4 ON e4.a = e1.b AND e4.b = e2.b
        JOIN und e5 ON e5.a = e1.b AND e5.b = e3.b
        JOIN und e6 ON e6.a = e2.b AND e6.b = e3.b
    """
