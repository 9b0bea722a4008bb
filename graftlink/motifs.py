"""Order-4 undirected motif census (graphlet counts).

igraph surface matched: `igraph_motifs_randesu(size=4)` on an
undirected graph (igraph@0.10.x src/motifs/randesu.c [unverified
file]) — the counts of all 6 connected induced 4-vertex subgraph
classes: path (P4), star (K1,3), cycle (C4), paw (triangle + pendant),
diamond (K4 minus an edge), clique (K4). igraph enumerates by
recursive extension (ESU), which is sequential-DFS-shaped; the
distributed formulation below computes the same 6 numbers from
closed-form SUBGRAPH sums and inverts the (triangular) subgraph->
induced overcount matrix — every term is an equi-join + partial agg,
no enumeration of 4-sets at all.

Subgraph (non-induced) counts, all exact:
    S_star    = sum_v C(deg v, 3)
    S_paw     = sum_v tri(v) * (deg v - 2)
    S_P4      = sum_{(u,v) in E} (deg u - 1)(deg v - 1) - 3*T
    S_C4      = (1/2) sum_{u<v} C(cn(u,v), 2)      [cn = common nbrs]
    S_diamond = sum_{e in E} C(support e, 2)
    S_K4      = four_clique_count (degree-oriented join chain)

Induced counts by back-substitution (each coefficient = number of
row-type subgraphs inside the induced column-type; verified against
brute-force enumeration in tests/test_motifs.py):
    N_K4      = S_K4
    N_diamond = S_diamond - 6 N_K4
    N_C4      = S_C4 - N_diamond - 3 N_K4
    N_paw     = S_paw - 4 N_diamond - 12 N_K4
    N_star    = S_star - N_paw - 2 N_diamond - 4 N_K4
    N_P4      = S_P4 - 2 N_paw - 4 N_C4 - 6 N_diamond - 12 N_K4

All sums are taken in decimal(38,0) and finished in Python integer
arithmetic (exact far past 2^63; the triads module's ADVICE class of
double-precision drift cannot occur).

Scale shape: degree/triangle/support sums ride the existing oriented
triangle machinery (near-linear on power-law graphs). The one
super-linear term is the common-neighbor pair sum for S_C4 —
sum_c C(deg c, 2) wedge mass, the SAME inherent cost class as exact
4-cycle counting everywhere; it is a single groupBy over wedge pairs
(partial aggs, no windows). On a 100 TB graph cap or sample hub
centers the way linkpred._pair_counts documents (max_center_degree)
— the cap is a declared approximation there and would be here too.

DuckDB twin (motif_census_sql): INDEPENDENT decomposition — it
enumerates every connected 4-set directly (spanning path/star walks,
dedup via sorted vertex lists) and classifies by (edge count, max
within-set degree), so a coefficient error in either engine breaks
the cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.triangles import _closed_triangles, four_clique_count

MOTIFS = ["p4_path", "star_k13", "c4_cycle", "paw", "diamond", "k4_clique"]

_DEC = "decimal(38,0)"


def motif_census_4(edges: DataFrame) -> DataFrame:
    """DF[motif, count] — induced connected 4-vertex subgraph counts,
    one row per class in MOTIFS order (zeros included)."""
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )

    # ---- degree-only sums ----------------------------------------------
    drow = deg.agg(
        F.sum(
            (F.col("deg") * (F.col("deg") - 1) * (F.col("deg") - 2)).cast(_DEC)
        ).alias("s_star6"),
    ).collect()[0]
    s_star = int(drow["s_star6"] or 0) // 6

    # ---- per-edge degree products (P4) -----------------------------------
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    erow = (
        und.join(da, "a")
        .join(db, "b")
        .agg(
            F.sum(
                ((F.col("dega") - 1) * (F.col("degb") - 1)).cast(_DEC)
            ).alias("s")
        )
        .collect()[0]
    )
    s_p4_raw = int(erow["s"] or 0)

    # ---- triangles: T, per-vertex, per-edge support ----------------------
    tri = _closed_triangles(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).localCheckpoint(eager=True)
    t_count = tri.count()
    corners = (
        tri.select(F.col("u").alias("id"))
        .unionAll(tri.select(F.col("v").alias("id")))
        .unionAll(tri.select(F.col("w").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("t"))
    )
    prow = (
        corners.join(deg, "id")
        .agg(F.sum((F.col("t") * (F.col("deg") - 2)).cast(_DEC)).alias("s"))
        .collect()[0]
    )
    s_paw = int(prow["s"] or 0)
    s_p4 = s_p4_raw - 3 * t_count

    sup = (
        tri.select(F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y"))
        .unionAll(
            tri.select(F.least("u", "w").alias("x"), F.greatest("u", "w").alias("y"))
        )
        .unionAll(
            tri.select(F.least("v", "w").alias("x"), F.greatest("v", "w").alias("y"))
        )
        .groupBy("x", "y")
        .agg(F.count("*").alias("t"))
    )
    srow = sup.agg(
        F.sum((F.col("t") * (F.col("t") - 1)).cast(_DEC)).alias("s")
    ).collect()[0]
    s_diamond = int(srow["s"] or 0) // 2

    # ---- common-neighbor pair sum (C4) ------------------------------------
    inc = und.select(F.col("a").alias("c"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("c"), F.col("a").alias("n"))
    )
    n2 = inc.select(F.col("c"), F.col("n").alias("n2"))
    cn = (
        inc.join(n2, "c")
        .where(F.col("n") < F.col("n2"))
        .groupBy("n", "n2")
        .agg(F.count("*").alias("cn"))
    )
    crow = cn.agg(
        F.sum((F.col("cn") * (F.col("cn") - 1)).cast(_DEC)).alias("s")
    ).collect()[0]
    s_c4 = int(crow["s"] or 0) // 4

    s_k4 = four_clique_count(und.select(F.col("a").alias("src"), F.col("b").alias("dst"))).collect()[0][0]

    # ---- invert the overcount matrix --------------------------------------
    n_k4 = int(s_k4)
    n_diamond = s_diamond - 6 * n_k4
    n_c4 = s_c4 - n_diamond - 3 * n_k4
    n_paw = s_paw - 4 * n_diamond - 12 * n_k4
    n_star = s_star - n_paw - 2 * n_diamond - 4 * n_k4
    n_p4 = s_p4 - 2 * n_paw - 4 * n_c4 - 6 * n_diamond - 12 * n_k4

    vals = [n_p4, n_star, n_c4, n_paw, n_diamond, n_k4]
    return spark.createDataFrame(
        [(m, int(v)) for m, v in zip(MOTIFS, vals)], "motif string, count long"
    )


def motif_census_sql(clean: str) -> str:
    """DuckDB twin by DIRECT enumeration: every connected 4-set has a
    spanning path or spanning star; enumerate both, dedup on the
    sorted vertex list, classify by (edge count, max within-degree):
    6 edges K4; 5 diamond; 4 + maxdeg 3 paw, else C4; 3 + maxdeg 3
    star, else path."""
    return f"""
        WITH clean AS ({clean}),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM clean WHERE src <> dst
        ),
        nb AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
        walks AS (
            SELECT n1.u AS p, n1.v AS q, n2.v AS r, n3.v AS s
            FROM nb n1
            JOIN nb n2 ON n2.u = n1.v
            JOIN nb n3 ON n3.u = n2.v
            WHERE n2.v <> n1.u AND n3.v <> n2.u AND n3.v <> n1.u
        ),
        stars AS (
            SELECT c1.u AS p, c1.v AS q, c2.v AS r, c3.v AS s
            FROM nb c1
            JOIN nb c2 ON c2.u = c1.u AND c2.v > c1.v
            JOIN nb c3 ON c3.u = c1.u AND c3.v > c2.v
        ),
        sets AS (
            SELECT DISTINCT l[1] AS v1, l[2] AS v2, l[3] AS v3, l[4] AS v4
            FROM (
                SELECT list_sort([p, q, r, s]) AS l FROM walks
                UNION ALL
                SELECT list_sort([p, q, r, s]) FROM stars
            )
        ),
        classified AS (
            SELECT v1, v2, v3, v4,
                   e12 + e13 + e14 + e23 + e24 + e34 AS ecnt,
                   greatest(e12 + e13 + e14, e12 + e23 + e24,
                            e13 + e23 + e34, e14 + e24 + e34) AS maxdeg
            FROM (
                SELECT v1, v2, v3, v4,
                  (EXISTS (SELECT 1 FROM und WHERE a = v1 AND b = v2))::int AS e12,
                  (EXISTS (SELECT 1 FROM und WHERE a = v1 AND b = v3))::int AS e13,
                  (EXISTS (SELECT 1 FROM und WHERE a = v1 AND b = v4))::int AS e14,
                  (EXISTS (SELECT 1 FROM und WHERE a = v2 AND b = v3))::int AS e23,
                  (EXISTS (SELECT 1 FROM und WHERE a = v2 AND b = v4))::int AS e24,
                  (EXISTS (SELECT 1 FROM und WHERE a = v3 AND b = v4))::int AS e34
                FROM sets
            )
        ),
        counted AS (
            SELECT CASE
                     WHEN ecnt = 6 THEN 'k4_clique'
                     WHEN ecnt = 5 THEN 'diamond'
                     WHEN ecnt = 4 AND maxdeg = 3 THEN 'paw'
                     WHEN ecnt = 4 THEN 'c4_cycle'
                     WHEN ecnt = 3 AND maxdeg = 3 THEN 'star_k13'
                     ELSE 'p4_path'
                   END AS motif,
                   count(*) AS cnt
            FROM classified GROUP BY 1
        )
        SELECT m.motif, CAST(coalesce(c.cnt, 0) AS BIGINT) AS count
        FROM (VALUES ('p4_path'), ('star_k13'), ('c4_cycle'), ('paw'),
                     ('diamond'), ('k4_clique')) m(motif)
        LEFT JOIN counted c ON c.motif = m.motif
    """
