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


def transitivity_barrat(
    edges: DataFrame,
    weight_col: str | None = None,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """DF[id, barrat] — Barrat et al. 2004 weighted local clustering
    (igraph surface: igraph_transitivity_barrat, python
    Graph.transitivity_barrat; igraph@0.10.x
    src/properties/triangles.c [unverified — reference checkout is
    empty]):

        C_i = 1 / (s_i (k_i - 1)) * sum over triangles {i,j,h} of
              (w_ij + w_ih)

    (ordered-neighbor-pair convention, so uniform weights reduce to
    the plain local clustering coefficient — the paper's stated
    property; pytest pins both). Vertices with k < 2 score 0.0.

    `weight_col` names a SYMMETRIC edge weight (parallel edges
    accumulate); None means UNIT weights on the simple undirected
    view (igraph's unweighted convention — NOT multiplicity, so the
    uniform-reduction property holds on multigraph inputs). Shape:
    the same degree-ordered oriented wedge join as every other
    triangle kernel, plus three canonical-key weight attaches and
    one partial-agg groupBy per corner — no Window, no Python."""
    base = edges.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        *([F.col(weight_col).alias("_w")] if weight_col is not None else []),
    ).where(F.col("a") != F.col("b"))
    if weight_col is not None:
        undw = base.groupBy("a", "b").agg(
            F.sum("_w").cast("double").alias("w")
        )
    else:
        undw = base.distinct().withColumn("w", F.lit(1.0))
    undw = undw.localCheckpoint(eager=True)
    inc = undw.select(F.col("a").alias("id"), "w").unionAll(
        undw.select(F.col("b").alias("id"), "w")
    )
    ds = inc.groupBy("id").agg(
        F.count("*").alias("k"), F.sum("w").alias("s")
    )
    tri = _closed_triangles(undw.select(F.col("a").alias("src"), F.col("b").alias("dst"))).select(
        F.col("u").alias("c1"), F.col("v").alias("c2"), F.col("w").alias("c3")
    )

    def wjoin(t, x, y, out):
        wt = undw.select(
            F.col("a").alias("_x"), F.col("b").alias("_y"), F.col("w").alias(out)
        )
        return t.join(
            wt.hint("shuffle_hash"),
            (F.least(x, y) == F.col("_x")) & (F.greatest(x, y) == F.col("_y")),
        ).drop("_x", "_y")

    t = wjoin(tri, F.col("c1"), F.col("c2"), "w12")
    t = wjoin(t, F.col("c1"), F.col("c3"), "w13")
    t = wjoin(t, F.col("c2"), F.col("c3"), "w23")
    corners = (
        t.select(F.col("c1").alias("id"), (F.col("w12") + F.col("w13")).alias("cw"))
        .unionAll(
            t.select(F.col("c2").alias("id"), (F.col("w12") + F.col("w23")).alias("cw"))
        )
        .unionAll(
            t.select(F.col("c3").alias("id"), (F.col("w13") + F.col("w23")).alias("cw"))
        )
        .groupBy("id")
        .agg(F.sum("cw").alias("num"))
    )
    if vertices is None:
        from graftlink.vertices import vertex_universe

        vertices = vertex_universe(edges)
    return (
        vertices.select("id")
        .join(ds.hint("shuffle_hash"), "id", "left")
        .join(corners.hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            F.when(
                (F.coalesce("k", F.lit(0)) < 2) | F.col("num").isNull(),
                F.lit(0.0),
            )
            .otherwise(
                F.round(
                    F.col("num") / (F.col("s") * (F.col("k") - 1)), 6
                )
            )
            .alias("barrat"),
        )
    )


def transitivity_barrat_sql(clean: str, weight_expr: str) -> str:
    """DuckDB twin over a clean(src,dst) CTE body; `weight_expr` is a
    SQL expression over canonical (a, b) yielding the symmetric edge
    weight (mirrors the Spark caller computing the same weight on
    (least, greatest))."""
    return f"""
        WITH undw AS (
            SELECT a, b, CAST({weight_expr} AS DOUBLE) AS w FROM (
                SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                FROM ({clean}) WHERE src <> dst
            )
        ),
        ds AS (
            SELECT id, count(*) AS k, sum(w) AS s FROM (
                SELECT a AS id, w FROM undw
                UNION ALL SELECT b, w FROM undw
            ) GROUP BY id
        ),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z,
                   e1.w AS wxy, e2.w AS wxz, e3.w AS wyz
            FROM undw e1
            JOIN undw e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN undw e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        corners AS (
            SELECT id, sum(cw) AS num FROM (
                SELECT x AS id, wxy + wxz AS cw FROM tri
                UNION ALL SELECT y, wxy + wyz FROM tri
                UNION ALL SELECT z, wxz + wyz FROM tri
            ) GROUP BY id
        )
        SELECT d.id,
               CASE WHEN d.k < 2 OR c.num IS NULL THEN 0.0
                    ELSE round(c.num / (d.s * (d.k - 1)), 6)
               END AS barrat
        FROM ds d LEFT JOIN corners c ON c.id = d.id
    """
