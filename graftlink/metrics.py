"""Graph-level metrics: density, reciprocity, degree distribution,
degree assortativity.

igraph surface being matched (upstream anchors; checkout was empty,
SURVEY.md header):
- igraph_density            (igraph@0.10.x src/properties/basic_properties.c)
- igraph_reciprocity        (same file; default ratio mode, ignoring loops)
- igraph_assortativity_degree (src/properties/degrees.c wrapper over
  igraph_assortativity) — undirected convention: Pearson correlation
  of endpoint degrees over the edge list with each edge counted in
  both orientations.

All four are single-pass joins/aggregations — fully whole-stage-
codegen, shuffle only on the degree groupBys — and each ships a
DuckDB twin in __spark_entry__ so the driver value-checks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _und(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def density(edges: DataFrame, n_vertices: int | None = None) -> DataFrame:
    """One-row DF[n_vertices, n_edges, density] — directed simple-graph
    density m / (n*(n-1)), self-loops and duplicates dropped."""
    from graftlink.docs_graph import clean_edges
    from graftlink.vertices import vertex_universe

    e = clean_edges(edges)
    n = n_vertices if n_vertices is not None else vertex_universe(e).count()
    return e.agg(F.count("*").alias("n_edges")).select(
        F.lit(n).cast("long").alias("n_vertices"),
        "n_edges",
        F.round(F.col("n_edges") / F.lit(float(n * (n - 1))), 8).alias("density"),
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """One-row DF[reciprocity] — fraction of directed edges whose
    reverse edge also exists (igraph default ratio mode; loops
    ignored). Semi-join against the flipped table; at scale both sides
    hash-partition on (src, dst) so the join is one co-keyed shuffle."""
    from graftlink.docs_graph import clean_edges

    e = clean_edges(edges)
    flipped = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.join(flipped, ["src", "dst"], "left_semi")
    return mutual.agg(F.count("*").alias("_m")).crossJoin(
        e.agg(F.count("*").alias("_t"))
    ).select(F.round(F.col("_m") / F.col("_t"), 8).alias("reciprocity"))


def degree_distribution(edges: DataFrame, direction: str = "all") -> DataFrame:
    """DF[degree, n_vertices] — histogram of vertex degrees."""
    from graftlink.vertices import degrees

    return (
        degrees(edges, direction)
        .groupBy("degree")
        .agg(F.count("*").alias("n_vertices"))
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One-row DF[assortativity] — Pearson correlation of endpoint
    degrees over the undirected simple edge list, each edge counted in
    both orientations (networkx/igraph undirected convention)."""
    und = _und(edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    both = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    return (
        both.join(da, "a")
        .join(db, "b")
        .agg(F.round(F.corr("deg_a", "deg_b"), 8).alias("assortativity"))
    )


def dyad_census(edges: DataFrame) -> DataFrame:
    """One-row DF[mut, asym, nulls] — igraph_dyad_census: unordered
    vertex pairs with reciprocal edges (mut), exactly one edge (asym),
    no edge (nulls = C(n,2) - mut - asym; igraph calls the field
    "null", renamed because it is a reserved word in both SQL
    engines). Self-loops/duplicates
    dropped. One groupBy over the canonical pair key — the count of
    directions per pair IS the classification; null comes from the
    vertex-universe scalar, never a pair enumeration."""
    from graftlink.docs_graph import clean_edges
    from graftlink.vertices import vertex_universe

    e = clean_edges(edges)
    per_pair = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("_dirs"))
    )
    counts = per_pair.agg(
        F.sum((F.col("_dirs") == 2).cast("long")).alias("mut"),
        F.sum((F.col("_dirs") == 1).cast("long")).alias("asym"),
    )
    n = vertex_universe(e).count()
    total_pairs = n * (n - 1) // 2
    return counts.select(
        "mut",
        "asym",
        (F.lit(total_pairs) - F.col("mut") - F.col("asym")).alias("nulls"),
    )


# ---------------------------------------------------------------------------
def vertex_jaccard_similarity(
    edges: DataFrame, min_common: int = 1, threshold: float = 0.0
) -> DataFrame:
    """DF[a, b, similarity] (a<b) — Jaccard similarity of undirected
    neighbor sets (igraph_similarity_jaccard semantics over vertex
    pairs with >= min_common shared neighbors; pairs with none are
    omitted rather than emitted as 0, which keeps the output linear
    in wedge count instead of n^2).

    Plan: wedge self-join through the shared neighbor (both edges of
    the wedge keyed on the center vertex — one co-keyed shuffle),
    count common neighbors per pair, then |N(a) u N(b)| = da+db-common
    from the degree table. All built-in joins/aggs."""
    und = _und(edges)
    both = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # (center c, leaf x): each undirected edge in both directions
    inc = both.select(F.col("a").alias("c"), F.col("b").alias("x"))
    wedges = (
        inc.alias("l")
        .join(inc.alias("r"), "c")
        .where(F.col("l.x") < F.col("r.x"))
        .select(F.col("l.x").alias("a"), F.col("r.x").alias("b"))
    )
    common = wedges.groupBy("a", "b").agg(F.count("*").alias("common"))
    deg = inc.groupBy(F.col("c").alias("id")).agg(F.count("*").alias("deg"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    sim = F.col("common") / (F.col("deg_a") + F.col("deg_b") - F.col("common"))
    return (
        common.where(F.col("common") >= min_common)
        .join(da, "a")
        .join(db, "b")
        .select("a", "b", F.round(sim, 8).alias("similarity"))
        .where(F.col("similarity") >= threshold)
    )


# ---------------------------------------------------------------------------
# DuckDB twins (over the documents stand-in edge SQL)
# ---------------------------------------------------------------------------


def density_sql(clean_edges_sql: str) -> str:
    return f"""
        WITH e AS ({clean_edges_sql}),
        v AS (SELECT count(*) AS n FROM
              (SELECT src AS id FROM e UNION SELECT dst FROM e))
        SELECT v.n AS n_vertices, (SELECT count(*) FROM e) AS n_edges,
               round((SELECT count(*) FROM e) / (CAST(v.n AS DOUBLE) * (v.n - 1)), 8)
                 AS density
        FROM v
    """


def dyad_census_sql(clean_edges_sql: str) -> str:
    return f"""
        WITH e AS ({clean_edges_sql}),
        per_pair AS (
            SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                   count(*) AS dirs
            FROM e GROUP BY 1, 2
        ),
        v AS (SELECT count(*) AS n FROM
              (SELECT src AS id FROM e UNION SELECT dst FROM e))
        SELECT CAST(sum(CASE WHEN dirs = 2 THEN 1 ELSE 0 END) AS BIGINT) AS mut,
               CAST(sum(CASE WHEN dirs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS asym,
               CAST((SELECT n * (n - 1) // 2 FROM v)
                 - sum(CASE WHEN dirs = 2 THEN 1 ELSE 0 END)
                 - sum(CASE WHEN dirs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nulls
        FROM per_pair
    """


def reciprocity_sql(clean_edges_sql: str) -> str:
    return f"""
        WITH e AS ({clean_edges_sql})
        SELECT round(
            (SELECT count(*) FROM e
             WHERE EXISTS (SELECT 1 FROM e r
                           WHERE r.src = e.dst AND r.dst = e.src))
            / CAST((SELECT count(*) FROM e) AS DOUBLE), 8) AS reciprocity
    """


def degree_distribution_sql(clean_edges_sql: str) -> str:
    return f"""
        WITH e AS ({clean_edges_sql}),
        deg AS (
            SELECT id, count(*) AS degree FROM (
                SELECT src AS id FROM e UNION ALL SELECT dst FROM e
            ) GROUP BY id
        )
        SELECT degree, count(*) AS n_vertices FROM deg GROUP BY degree
    """


def degree_assortativity_sql(und_sql: str) -> str:
    return f"""
        WITH und AS ({und_sql}),
        deg AS (
            SELECT id, count(*) AS deg FROM (
                SELECT a AS id FROM und UNION ALL SELECT b FROM und
            ) GROUP BY id
        ),
        both_dir AS (
            SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
        )
        SELECT round(corr(da.deg, db.deg), 8) AS assortativity
        FROM both_dir e
        JOIN deg da ON e.a = da.id
        JOIN deg db ON e.b = db.id
    """


def vertex_jaccard_similarity_sql(und_sql: str, min_common: int = 1,
                                  threshold: float = 0.0) -> str:
    return f"""
        WITH und AS ({und_sql}),
        inc AS (
            SELECT a AS c, b AS x FROM und
            UNION ALL SELECT b AS c, a AS x FROM und
        ),
        common AS (
            SELECT l.x AS a, r.x AS b, count(*) AS common
            FROM inc l JOIN inc r ON l.c = r.c AND l.x < r.x
            GROUP BY l.x, r.x HAVING count(*) >= {min_common}
        ),
        deg AS (SELECT c AS id, count(*) AS deg FROM inc GROUP BY c)
        SELECT common.a, common.b,
               round(CAST(common AS DOUBLE)
                     / (da.deg + db.deg - common), 8) AS similarity
        FROM common
        JOIN deg da ON common.a = da.id
        JOIN deg db ON common.b = db.id
        WHERE CAST(common AS DOUBLE) / (da.deg + db.deg - common) >= {threshold}
    """

def assortativity_nominal(
    edges: DataFrame, labels: DataFrame, directed: bool = True
) -> DataFrame:
    """One-row DF[assortativity] — igraph_assortativity_nominal:
    Newman's category assortativity r = (Σe_ii − Σa_i b_i) /
    (1 − Σa_i b_i) over the edge mixing matrix (labels: DF[id, cat]).
    Directed form; undirected passes each edge both ways first.
    One labeled-edge join + two scalar aggregations — no category
    matrix is materialized (the sums fold it away)."""
    from graftlink.docs_graph import clean_edges

    e = clean_edges(edges)
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    ls = labels.select(F.col("id").alias("src"), F.col("cat").alias("_cs"))
    ld = labels.select(F.col("id").alias("dst"), F.col("cat").alias("_cd"))
    lab = e.join(ls, "src").join(ld, "dst")
    m = lab.count()
    # e_ii: same-category edge fraction
    eii = lab.where(F.col("_cs") == F.col("_cd")).count() / m
    # Σ a_i b_i: out-fraction x in-fraction per category
    marg = (
        lab.groupBy(F.col("_cs").alias("cat")).agg(F.count("*").alias("_o"))
        .join(
            lab.groupBy(F.col("_cd").alias("cat")).agg(F.count("*").alias("_i")),
            "cat", "full",
        )
        .agg(
            F.sum(
                F.coalesce("_o", F.lit(0)) * F.coalesce("_i", F.lit(0))
            ).alias("ab")
        )
        .collect()[0]["ab"]
    )
    ab = marg / (m * m)
    r = (eii - ab) / (1.0 - ab) if ab < 1.0 else 1.0
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(round(float(r), 6),)], "assortativity double"
    )


def assortativity_nominal_sql(clean: str, labels_sql: str) -> str:
    """DuckDB twin (directed form); labels_sql -> (id, cat)."""
    return f"""
        WITH e AS ({clean}),
        lab AS MATERIALIZED (
            SELECT ls.cat AS cs, ld.cat AS cd
            FROM e
            JOIN ({labels_sql}) ls ON ls.id = e.src
            JOIN ({labels_sql}) ld ON ld.id = e.dst
        ),
        m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM lab),
        eii AS (
            SELECT count(*) / (SELECT m FROM m) AS v FROM lab WHERE cs = cd
        ),
        ab AS (
            SELECT sum(coalesce(o.c, 0) * coalesce(i.c, 0))
                   / ((SELECT m FROM m) * (SELECT m FROM m)) AS v
            FROM (SELECT cs AS cat, count(*) AS c FROM lab GROUP BY 1) o
            FULL JOIN (SELECT cd AS cat, count(*) AS c FROM lab GROUP BY 1) i
              USING (cat)
        )
        SELECT round(((SELECT v FROM eii) - (SELECT v FROM ab))
                     / (1.0 - (SELECT v FROM ab)), 6) AS assortativity
    """

def diversity(
    edges: DataFrame, weight_col: str = "weight"
) -> DataFrame:
    """DF[id, diversity] — igraph_diversity: per-vertex Shannon
    entropy of incident edge weights normalized by log(degree), over
    the undirected weighted view (parallel directions summed).
    Degree-1 vertices get 0 (igraph convention); isolated vertices
    are omitted (igraph returns NaN).

    Entropy as partial-agg sums only: with S = Σw and
    T = Σ w·ln w, H = ln S − T/S — so a hub's incident weights
    combine map-side; no per-vertex collections."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    inc = und.select(F.col("a").alias("id"), "w").unionByName(
        und.select(F.col("b").alias("id"), "w")
    )
    agg = inc.groupBy("id").agg(
        F.count("*").alias("_k"),
        F.sum("w").alias("_s"),
        F.sum(F.col("w") * F.log("w")).alias("_t"),
    )
    h = F.log("_s") - F.col("_t") / F.col("_s")
    return agg.select(
        "id",
        F.round(
            F.when(F.col("_k") >= 2, h / F.log("_k")).otherwise(F.lit(0.0)), 6
        ).alias("diversity"),
    )


def diversity_sql(weighted_und_sql: str) -> str:
    """DuckDB twin; weighted_und_sql -> (a, b, w) canonical a<b."""
    return f"""
        WITH und AS ({weighted_und_sql}),
        inc AS (
            SELECT a AS id, w FROM und UNION ALL SELECT b, w FROM und
        ),
        agg AS (
            SELECT id, count(*) AS k, sum(w) AS s, sum(w * ln(w)) AS t
            FROM inc GROUP BY id
        )
        SELECT id,
               round(CASE WHEN k >= 2 THEN (ln(s) - t / s) / ln(k)
                     ELSE 0.0 END, 6) AS diversity
        FROM agg
    """


def neighborhood_size(
    edges: DataFrame,
    order: int = 2,
    mode: str = "all",
    approx: bool = False,
) -> DataFrame:
    """DF[id, size] — igraph_neighborhood_size: the number of vertices
    within <= `order` hops of each vertex, INCLUDING the vertex itself
    (igraph@0.10.x src/operators/neighborhood.c [unverified file]).
    mode: "all" (undirected view), "out" (follow edges forward), "in".

    Shape: order-1 self-joins with a distinct between rounds — the
    ball frontier is re-deduplicated every hop, so the working set is
    Sum_v |N<=r(v)|, the true output mass, not deg^r. That mass itself
    explodes on small-world graphs at r >= 3 (every ball is the whole
    graph); for the 100 TB path set approx=True, which drops the exact
    pair materialization of the LAST hop into approx_count_distinct
    (HLL++, 2% default rsd) — the standard web-graph ball-size
    estimator (ANF/HyperBall family).
    """
    if mode == "all":
        e = _und(edges)
        step = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
    elif mode in ("out", "in"):
        d = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
        step = (
            d.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            if mode == "out"
            else d.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
    else:
        raise ValueError(f"mode must be all|in|out, got {mode!r}")
    from graftlink.vertices import vertex_universe

    ball = vertex_universe(edges).select(
        F.col("id").alias("center"), F.col("id").alias("v")
    )
    hop_step = step.select(F.col("u").alias("_hu"), F.col("v").alias("_hv"))
    for hop in range(order):
        grown = ball.unionAll(
            ball.join(hop_step, ball["v"] == F.col("_hu")).select(
                "center", F.col("_hv").alias("v")
            )
        )
        last = hop == order - 1
        if last and approx:
            return grown.groupBy(F.col("center").alias("id")).agg(
                F.approx_count_distinct("v").alias("size")
            )
        ball = grown.distinct()
    return ball.groupBy(F.col("center").alias("id")).agg(
        F.count("*").alias("size")
    )


def neighborhood_size_sql(clean: str, order: int = 2, mode: str = "all") -> str:
    """DuckDB twin: iterated-join ball with per-hop dedup."""
    if mode == "all":
        nb = """SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und"""
    elif mode == "out":
        nb = "SELECT DISTINCT src AS u, dst AS v FROM clean WHERE src <> dst"
    else:
        nb = "SELECT DISTINCT dst AS u, src AS v FROM clean WHERE src <> dst"
    ball = "SELECT id AS center, id AS v FROM verts"
    for _ in range(order):
        ball = f"""
            SELECT DISTINCT center, v FROM (
                ({ball})
                UNION ALL
                SELECT b.center, n.v FROM ({ball}) b JOIN nb n ON n.u = b.v
            )
        """
    return f"""
        WITH clean AS ({clean}),
        verts AS (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM clean UNION ALL SELECT dst FROM clean
            )
        ),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM clean WHERE src <> dst
        ),
        nb AS ({nb})
        SELECT center AS id, count(*) AS size FROM ({ball}) GROUP BY center
    """


def assortativity_values(
    edges: DataFrame,
    values: DataFrame,
    value_col: str = "x",
) -> DataFrame:
    """One-row DF[assortativity] — igraph assortativity(values=):
    Pearson correlation of an arbitrary NUMERIC vertex attribute
    across undirected simple edges, each edge counted in both
    orientations (the igraph/Newman convention; with the degree as the
    attribute this reduces to degree_assortativity). values:
    DF[id, <value_col>]. Two broadcast-eligible joins + one scalar
    corr agg — nothing vertex-quadratic."""
    und = _und(edges)
    both = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    va = values.select(F.col("id").alias("a"), F.col(value_col).alias("xa"))
    vb = values.select(F.col("id").alias("b"), F.col(value_col).alias("xb"))
    return (
        both.join(va, "a")
        .join(vb, "b")
        .agg(F.round(F.corr("xa", "xb"), 8).alias("assortativity"))
    )


def assortativity_values_sql(clean: str, values_sql: str) -> str:
    """DuckDB twin; values_sql -> (id, x)."""
    return f"""
        WITH clean AS ({clean}),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM clean WHERE src <> dst
        ),
        both_dir AS (
            SELECT a, b FROM und UNION ALL SELECT b, a FROM und
        ),
        vals AS ({values_sql})
        SELECT round(corr(va.x, vb.x), 8) AS assortativity
        FROM both_dir e
        JOIN vals va ON va.id = e.a
        JOIN vals vb ON vb.id = e.b
    """
