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
