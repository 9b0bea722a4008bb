"""Graph-structure utility operators: induced subgraphs, vertex
contraction, and graph set algebra.

igraph surface matched: `igraph_induced_subgraph`,
`igraph_contract_vertices` (igraph@0.10.x src/graph/subgraph.c,
src/operators/contract.c [unverified files]) and the binary graph
operators `igraph_union` / `igraph_intersection` / `igraph_difference`
(src/operators/ [unverified]). igraph's complement and full rewiring
are deliberately absent: complement of a sparse web graph is dense
(O(n²) edges — not a 100 TB-sane object), and rewire is RNG-defined
with no deterministic contract to match.

All of these are single relational expressions — semi-joins,
distinct unions, anti-joins — that Catalyst plans as broadcast or
shuffled hash joins with full predicate pushdown; none introduces a
new scale concern. They exist as named, tested operators because a
user of igraph reaches for them by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def induced_subgraph(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Edges with BOTH endpoints in `vertices` (DF[id]) —
    igraph_induced_subgraph(impl=COPY_AND_DELETE) edge semantics."""
    v = vertices.select("id")
    return (
        edges.join(v.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(v.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )


def contract_vertices(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Quotient graph under mapping DF[id, group]: edge (u, v) becomes
    (group(u), group(v)); self-loops dropped, parallel edges merged
    with a multiplicity count (igraph_contract_vertices followed by
    igraph_simplify(remove_loops, combine='sum') — the combination
    every coarsening pass in this engine already relies on)."""
    m_src = mapping.select(F.col("id").alias("src"), F.col("group").alias("_gs"))
    m_dst = mapping.select(F.col("id").alias("dst"), F.col("group").alias("_gd"))
    return (
        edges.join(m_src, "src")
        .join(m_dst, "dst")
        .where(F.col("_gs") != F.col("_gd"))
        .groupBy(F.col("_gs").alias("src"), F.col("_gd").alias("dst"))
        .agg(F.count("*").alias("weight"))
    )


def graph_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Directed edge-set union (igraph_union, simple graphs)."""
    return a.select("src", "dst").unionByName(b.select("src", "dst")).distinct()


def graph_intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """Directed edge-set intersection (igraph_intersection)."""
    return a.select("src", "dst").distinct().join(
        b.select("src", "dst").distinct(), ["src", "dst"], "left_semi"
    )


def graph_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """Edges of a not in b (igraph_difference)."""
    return a.select("src", "dst").distinct().join(
        b.select("src", "dst"), ["src", "dst"], "left_anti"
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def induced_subgraph_sql(clean: str, vertex_pred_sql: str) -> str:
    return f"""
        WITH e AS ({clean}),
        v AS (SELECT id FROM (
            SELECT DISTINCT src AS id FROM e UNION SELECT dst FROM e
        ) WHERE {vertex_pred_sql})
        SELECT src, dst FROM e
        WHERE src IN (SELECT id FROM v) AND dst IN (SELECT id FROM v)
    """


def contract_vertices_sql(clean: str, group_expr: str) -> str:
    return f"""
        WITH e AS ({clean})
        SELECT ({group_expr.replace('?', 'src')}) AS src,
               ({group_expr.replace('?', 'dst')}) AS dst,
               count(*) AS weight
        FROM e
        WHERE ({group_expr.replace('?', 'src')})
           <> ({group_expr.replace('?', 'dst')})
        GROUP BY 1, 2
    """


def graph_predicates(edges: DataFrame) -> DataFrame:
    """One-row DF[n_vertices, n_edges, n_self_loops, n_multi_edges,
    is_simple, is_weakly_connected] — igraph's vcount/ecount/
    is_simple/has_multiple/is_connected(WEAK) predicate surface in a
    single pass: the count columns are one partial-agg scan of the
    edge table plus one distinct-vertex count; weak connectivity
    reuses the engine's CC kernel (component count == 1). All scalar
    aggregates — no closure, no enumeration."""
    from graftlink.components import connected_components
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    n_v = vertex_universe(edges).count()
    row = edges.agg(
        F.count("*").alias("rows"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("loops"),
    ).collect()[0]
    n_distinct = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst").distinct().count()
    )
    n_multi = int(row["rows"]) - int(row["loops"]) - n_distinct
    n_comp = (
        connected_components(edges).agg(F.max("component")).collect()[0][0]
    )
    is_conn = n_comp == 0 and n_v > 0
    return spark.createDataFrame(
        [(
            int(n_v), int(row["rows"]), int(row["loops"]), int(n_multi),
            bool(row["loops"] == 0 and n_multi == 0), bool(is_conn),
        )],
        "n_vertices long, n_edges long, n_self_loops long, "
        "n_multi_edges long, is_simple boolean, is_weakly_connected boolean",
    )


def graph_predicates_sql(clean: str) -> str:
    """Twin: counts are direct aggregates; weak connectivity via the
    undirected min-label closure (component count == 1)."""
    return f"""
        WITH RECURSIVE
        clean AS ({clean}),
        verts AS (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM clean UNION ALL SELECT dst FROM clean
            )
        ),
        nb AS (
            SELECT src AS u, dst AS v FROM clean
            UNION SELECT dst, src FROM clean
        ),
        lbl(id, lab) AS (
            SELECT id, id FROM verts
            UNION
            SELECT n.v, l.lab FROM lbl l JOIN nb n ON n.u = l.id
            WHERE l.lab < n.v
        ),
        comp AS (SELECT id, min(lab) AS lab FROM lbl GROUP BY id),
        stats AS (
            SELECT count(*) AS rows_,
                   sum(CASE WHEN src = dst THEN 1 ELSE 0 END) AS loops,
                   (SELECT count(*) FROM (
                        SELECT DISTINCT src, dst FROM clean WHERE src <> dst
                    )) AS dedup
            FROM clean
        )
        SELECT (SELECT count(*) FROM verts) AS n_vertices,
               rows_ AS n_edges,
               CAST(loops AS BIGINT) AS n_self_loops,
               CAST(rows_ - loops - dedup AS BIGINT) AS n_multi_edges,
               (loops = 0 AND rows_ - loops - dedup = 0) AS is_simple,
               ((SELECT count(DISTINCT lab) FROM comp) = 1
                AND (SELECT count(*) FROM verts) > 0)
                   AS is_weakly_connected
        FROM stats
    """
