"""Structural similarity / link-prediction operators.

igraph surface matched (igraph@0.10.x src/properties/similarity.c,
src/properties/degrees.c [unverified files]):
  - `igraph_cocitation`           -> cocitation(a, b)   = |in(a)  ∩ in(b)|
  - `igraph_bibcoupling`          -> bibcoupling(a, b)  = |out(a) ∩ out(b)|
  - `igraph_similarity_dice`      -> 2|N∩| / (|Na| + |Nb|)
  - `igraph_similarity_inverse_log_weighted`
        -> Σ_{c ∈ N(a)∩N(b)} 1/ln(deg(c))   (Adamic–Adar)
  - `igraph_avg_nearest_neighbor_degree` (knn / knnk)

All five decompose into the SAME distributed shape as the round-1
Jaccard (`metrics.vertex_jaccard_similarity`): a wedge self-join
through the shared neighbor — both wedge edges keyed on the CENTER
vertex, so the join is one co-keyed shuffle and the per-pair reduce
is a partial+final hash agg (hub centers combine map-side). Pairs
with zero overlap are omitted rather than emitted as 0, keeping the
output linear in the wedge count instead of n².

Scale envelope (write it down, don't discover it at 100 TB): the
number of wedges through a center c is C(deg(c), 2) — inherently
quadratic in hub degree because the OUTPUT is (every operator here
emits a row per co-cited pair). `max_center_degree` caps the centers
that expand (the standard web-scale Adamic–Adar practice: a page
linked by 10^7 others contributes ~5·10^13 pairs and no ranking
signal); None keeps exact igraph semantics for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_und(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _pair_counts(inc: DataFrame, max_center_degree: int | None) -> DataFrame:
    """inc: DF[c, x] incidence (center, leaf). Returns DF[a, b, v]
    (a < b) with v = count of shared centers. The self-join is keyed
    on c — one shuffle, partial-agg reduce."""
    if max_center_degree is not None:
        keep = (
            inc.groupBy("c")
            .agg(F.count("*").alias("_d"))
            .where(F.col("_d") <= max_center_degree)
            .select("c")
        )
        inc = inc.join(keep, "c", "left_semi")
    left = inc.select("c", F.col("x").alias("a"))
    right = inc.select("c", F.col("x").alias("b"))
    pairs = left.join(right, "c").where(F.col("a") < F.col("b"))
    return pairs.groupBy("a", "b").agg(F.count("*").cast("double").alias("v"))


def cocitation(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """DF[a, b, cocitation] (a<b) — number of vertices that cite BOTH
    a and b (common in-neighbors; igraph_cocitation). Pairs with 0
    omitted."""
    inc = edges.select(F.col("src").alias("c"), F.col("dst").alias("x")).distinct()
    return _pair_counts(inc, max_center_degree).select(
        "a", "b", F.col("v").cast("long").alias("cocitation")
    )


def bibcoupling(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """DF[a, b, bibcoupling] (a<b) — number of vertices BOTH a and b
    cite (common out-neighbors; igraph_bibcoupling)."""
    inc = edges.select(F.col("dst").alias("c"), F.col("src").alias("x")).distinct()
    return _pair_counts(inc, max_center_degree).select(
        "a", "b", F.col("v").cast("long").alias("bibcoupling")
    )


def _und_incidence(edges: DataFrame) -> DataFrame:
    und = _canonical_und(edges)
    both = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return both.select(F.col("a").alias("c"), F.col("b").alias("x"))


def dice_similarity(
    edges: DataFrame,
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """DF[a, b, similarity] (a<b) — Dice similarity of undirected
    neighbor sets: 2|N(a)∩N(b)| / (|N(a)|+|N(b)|)
    (igraph_similarity_dice). Same wedge plan as Jaccard; the two
    degree joins are against the vertex-sized degree table."""
    inc = _und_incidence(edges)
    common = _pair_counts(inc, max_center_degree)
    deg = inc.groupBy(F.col("c").alias("id")).agg(F.count("*").alias("deg"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    return (
        common.where(F.col("v") >= min_common)
        .join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.round(
                F.lit(2.0) * F.col("v") / (F.col("deg_a") + F.col("deg_b")), 8
            ).alias("similarity"),
        )
    )


def inverse_log_weighted_similarity(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """DF[a, b, similarity] (a<b) — Adamic–Adar: each common
    (undirected) neighbor c contributes 1/ln(deg(c))
    (igraph_similarity_inverse_log_weighted, mode=ALL). Centers of
    degree 1 cannot be common neighbors, so ln(deg) > 0 everywhere
    the weight is consumed. The center weight joins BEFORE the wedge
    expansion (vertex-sized join), then rides the wedge rows into the
    same partial-agg sum."""
    inc = _und_incidence(edges)
    cdeg = inc.groupBy("c").agg(F.count("*").alias("_cd"))
    # degree-1 centers have one leaf and produce no pair — drop them
    # BEFORE the weight expr so ANSI mode never evaluates 1/ln(1)
    incw = (
        inc.join(cdeg.hint("shuffle_hash"), "c")
        .where(F.col("_cd") >= 2)
        .select(
            "c", "x", (F.lit(1.0) / F.log(F.col("_cd").cast("double"))).alias("_w")
        )
    )
    # the weight rides the LEFT wedge side only (one copy per pair)
    left = incw.select("c", F.col("x").alias("a"), "_w")
    right = incw.select("c", F.col("x").alias("b"))
    if max_center_degree is not None:
        keep = cdeg.where(F.col("_cd") <= max_center_degree).select("c")
        left = left.join(keep, "c", "left_semi")
        right = right.join(keep, "c", "left_semi")
    return (
        left.join(right, "c")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.round(F.sum("_w"), 8).alias("similarity"))
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """DF[id, deg, knn] — per-vertex average degree of its undirected
    neighbors (igraph_avg_nearest_neighbor_degree's knn vector).
    Two vertex-sized joins + one partial-agg mean — no wedge blowup."""
    inc = _und_incidence(edges)
    deg = inc.groupBy(F.col("c").alias("id")).agg(F.count("*").alias("deg"))
    ndeg = deg.select(F.col("id").alias("x"), F.col("deg").alias("_nd"))
    knn = (
        inc.join(ndeg.hint("shuffle_hash"), "x")
        .groupBy(F.col("c").alias("id"))
        .agg(F.round(F.avg("_nd"), 8).alias("knn"))
    )
    return deg.join(knn.hint("shuffle_hash"), "id").select("id", "deg", "knn")


def knnk(edges: DataFrame) -> DataFrame:
    """DF[deg, knnk] — knn averaged over vertices of each degree
    class (igraph's knnk output); one extra hash agg over the
    vertex-sized knn table."""
    return (
        avg_neighbor_degree(edges)
        .groupBy("deg")
        .agg(F.round(F.avg("knn"), 8).alias("knnk"))
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

_UND_CTE = """
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM clean WHERE src <> dst
        ),
        inc AS MATERIALIZED (
            SELECT a AS c, b AS x FROM und
            UNION ALL SELECT b AS c, a AS x FROM und
        ),
        deg AS MATERIALIZED (SELECT c AS id, count(*) AS deg FROM inc GROUP BY c)
"""


def cocitation_sql(clean: str) -> str:
    return f"""
        WITH clean AS ({clean}),
        inc AS (SELECT DISTINCT src AS c, dst AS x FROM clean)
        SELECT l.x AS a, r.x AS b, count(*) AS cocitation
        FROM inc l JOIN inc r ON r.c = l.c AND l.x < r.x
        GROUP BY 1, 2
    """


def bibcoupling_sql(clean: str) -> str:
    return f"""
        WITH clean AS ({clean}),
        inc AS (SELECT DISTINCT dst AS c, src AS x FROM clean)
        SELECT l.x AS a, r.x AS b, count(*) AS bibcoupling
        FROM inc l JOIN inc r ON r.c = l.c AND l.x < r.x
        GROUP BY 1, 2
    """


def dice_sql(clean: str, min_common: int = 1) -> str:
    return f"""
        WITH clean AS ({clean}),{_UND_CTE},
        common AS (
            SELECT l.x AS a, r.x AS b, count(*) AS cnt
            FROM inc l JOIN inc r ON r.c = l.c AND l.x < r.x
            GROUP BY 1, 2
        )
        SELECT c.a, c.b,
               round(2.0 * c.cnt / (da.deg + db.deg), 8) AS similarity
        FROM common c
        JOIN deg da ON da.id = c.a
        JOIN deg db ON db.id = c.b
        WHERE c.cnt >= {min_common}
    """


def inverse_log_weighted_sql(clean: str) -> str:
    return f"""
        WITH clean AS ({clean}),{_UND_CTE}
        SELECT l.x AS a, r.x AS b,
               round(sum(1.0 / ln(d.deg)), 8) AS similarity
        FROM inc l
        JOIN inc r ON r.c = l.c AND l.x < r.x
        JOIN deg d ON d.id = l.c
        GROUP BY 1, 2
    """


def avg_neighbor_degree_sql(clean: str) -> str:
    return f"""
        WITH clean AS ({clean}),{_UND_CTE}
        SELECT d.id, d.deg, round(avg(nd.deg), 8) AS knn
        FROM inc i
        JOIN deg nd ON nd.id = i.x
        JOIN deg d ON d.id = i.c
        GROUP BY 1, 2
    """


def knnk_sql(clean: str) -> str:
    return f"""
        WITH clean AS ({clean}),{_UND_CTE},
        knn AS (
            SELECT d.id, d.deg, avg(nd.deg) AS knn
            FROM inc i
            JOIN deg nd ON nd.id = i.x
            JOIN deg d ON d.id = i.c
            GROUP BY 1, 2
        )
        SELECT deg, round(avg(round(knn, 8)), 8) AS knnk FROM knn GROUP BY deg
    """

def constraint(edges: DataFrame) -> DataFrame:
    """DF[id, constraint] — Burt's structural-holes constraint
    (igraph_constraint, undirected unweighted convention; vertices
    with no neighbors are omitted, where igraph returns NaN).

    c(i) = Σ_{j∈N(i)} (p_ij + Σ_{q∈N(i)∩N(j)} p_iq p_qj)² with
    p_ij = 1/deg(i) unweighted, which collapses to
    c(i) = Σ_{j∈N(i)} ((1 + S_ij) / deg(i))² where
    S_ij = Σ_{common q} 1/deg(q) — SYMMETRIC per pair, so one
    degree-oriented triangle pass (O(m^1.5), power-law-safe) computes
    every S_ij as a partial-agg sum of the third corner's 1/deg, and
    the rest is two equi-joins against the degree table. No wedge
    enumeration, no windows."""
    from graftlink.triangles import _closed_triangles

    und = _canonical_und(edges).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    tri = _closed_triangles(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    # each triangle contributes 1/deg(third) to its three pairs
    def _side(p1, p2, q):
        return tri.select(
            F.least(p1, p2).alias("a"), F.greatest(p1, p2).alias("b"),
            F.col(q).alias("q"),
        )

    thirds = (
        _side("u", "v", "w")
        .unionAll(_side("u", "w", "v"))
        .unionAll(_side("v", "w", "u"))
        .join(deg.select(F.col("id").alias("q"), "deg"), "q")
        .groupBy("a", "b")
        .agg(F.sum(1.0 / F.col("deg")).alias("_s"))
    )
    pairs = und.join(thirds, ["a", "b"], "left").select(
        "a", "b", F.coalesce("_s", F.lit(0.0)).alias("_s")
    )
    # each undirected edge contributes to BOTH endpoints' sums
    ends = pairs.select(F.col("a").alias("id"), "_s").unionByName(
        pairs.select(F.col("b").alias("id"), "_s")
    )
    return (
        ends.join(deg, "id")
        .groupBy("id")
        .agg(
            F.round(
                F.sum(
                    F.pow((1.0 + F.col("_s")) / F.col("deg"), F.lit(2.0))
                ),
                6,
            ).alias("constraint")
        )
    )


def constraint_sql(clean: str) -> str:
    return f"""
        WITH e AS ({clean}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM e WHERE src <> dst
        ),
        deg AS MATERIALIZED (
            SELECT id, count(*) AS deg FROM (
                SELECT a AS id FROM und UNION ALL SELECT b FROM und
            ) GROUP BY id
        ),
        tri AS MATERIALIZED (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM und e1
            JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        thirds AS (
            SELECT a, b, sum(1.0 / d.deg) AS s FROM (
                SELECT x AS a, y AS b, z AS q FROM tri
                UNION ALL SELECT x, z, y FROM tri
                UNION ALL SELECT y, z, x FROM tri
            ) t JOIN deg d ON d.id = t.q
            GROUP BY a, b
        ),
        pairs AS (
            SELECT u.a, u.b, coalesce(t.s, 0.0) AS s
            FROM und u LEFT JOIN thirds t ON t.a = u.a AND t.b = u.b
        ),
        ends AS (
            SELECT a AS id, s FROM pairs
            UNION ALL SELECT b, s FROM pairs
        )
        SELECT ends.id,
               round(sum(pow((1.0 + s) / d.deg, 2)), 6) AS constraint
        FROM ends JOIN deg d ON d.id = ends.id
        GROUP BY ends.id
    """
