"""Maximal clique enumeration — closes the one remaining row of the
round-3 "deliberately absent igraph surface" ledger that is actually
tractable at scale (igraph_maximal_cliques / igraph_clique_number /
igraph_largest_cliques, igraph@0.10.x src/cliques/maximal_cliques.c
[unverified file — reference checkout is empty]; public anchor:
Eppstein-Löffler-Strash 2010 degeneracy BK, Svendsen-Mukherjee-
Tirthapura "Mining maximal cliques from a large graph using
MapReduce", 2015).

Why this is NOT the exponential blow-up the absence ledger feared:
the output-sensitive decomposition assigns every maximal clique to
exactly ONE owner vertex — its minimum member under the engine's
(degree, id) total order (the same orientation `triangles.py` uses) —
and the per-owner work only needs the owner's EGO NET:

  - P (candidates)  = forward neighbors of v (higher (deg,id)),
  - X (exclusion)   = backward neighbors of v,
  - ego edges       = edges between members of N(v); every such edge
    closes a triangle through v, so the listing mass is exactly
    3 * #triangles — the same mass `triangle_count` already shuffles,
    NOT deg^2.

Each ego net then runs Tomita-pivot Bron–Kerbosch in a vectorless
pure-Python kernel over a cogrouped `applyInPandas` — per-group
work is bounded by the ego-net size, which the (deg, id) orientation
keeps near the graph degeneracy for P. The only genuinely hostile
case is a hub whose FULL neighborhood must be shipped to one group
(X is not orientation-bounded); `max_group` caps it and raises — the
same declared-envelope discipline as `linkpred.max_center_degree`.
At web scale one runs with min_size >= 3 and the cap at ~1e5: a
vertex with a larger *ego net that still fits a clique* does not
exist in crawl graphs (it would need 1e5 mutually-linked pages).

No SQL twin — Bron–Kerbosch is not SQL-expressible (the driver
records a rows-only check); correctness is pytest-gated by EXACT set
parity with networkx.find_cliques on ER/karate/constructed fixtures,
the same gate style as the community family. `clique_number`, whose
answer is a scalar, DOES get a hash-green DuckDB twin via bounded
k-clique self-joins (`clique_number_sql`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_GROUP = 100_000


def _ordered_neighbors(edges: DataFrame) -> DataFrame:
    """DF[v, u, du, u_fwd] — full undirected neighbor lists with the
    (deg, id) order flag: u_fwd = neighbor u is AFTER v in the total
    order (candidate side); else u is exclusion side."""
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
    both = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    dv = deg.select(F.col("id").alias("a"), F.col("deg").alias("dv"))
    du = deg.select(F.col("id").alias("b"), F.col("deg").alias("du"))
    fwd = (F.col("dv") < F.col("du")) | (
        (F.col("dv") == F.col("du")) & (F.col("a") < F.col("b"))
    )
    return (
        both.join(dv, "a")
        .join(du, "b")
        .select(
            F.col("a").alias("v"),
            F.col("b").alias("u"),
            F.col("du"),
            fwd.alias("u_fwd"),
        )
    )


def _bron_kerbosch(adj: dict, R: list, P: set, X: set, out: list) -> None:
    """Tomita-pivot BK; emits sorted member tuples into `out`.
    Recursion depth <= clique number (tiny); sets of python ints."""
    if not P and not X:
        out.append(sorted(R))
        return
    pivot_candidates = P | X
    pivot = max(pivot_candidates, key=lambda u: len(P & adj.get(u, _EMPTY)))
    for u in sorted(P - adj.get(pivot, _EMPTY)):
        nu = adj.get(u, _EMPTY)
        _bron_kerbosch(adj, R + [u], P & nu, X & nu, out)
        P = P - {u}
        X = X | {u}


_EMPTY: frozenset = frozenset()


def maximal_cliques(
    edges: DataFrame,
    min_size: int = 1,
    max_size: int | None = None,
    max_group: int = DEFAULT_MAX_GROUP,
) -> DataFrame:
    """DF[members array<long>, size int] — every maximal clique of the
    undirected simple graph exactly once, members ascending.

    min_size/max_size filter the OUTPUT (igraph semantics: the cliques
    are still maximal in the full graph). Isolated vertices are the
    size-1 maximal cliques."""
    spark = edges.sparkSession
    nbrs = _ordered_neighbors(edges)
    # ego edges of owner v = (x, y) adjacent with both in N(v): one
    # row per (triangle, corner) — mass 3*#triangles, the exact mass
    # the triangle counter already handles
    from graftlink.triangles import _closed_triangles

    tri = _closed_triangles(edges)
    ego = (
        tri.select(F.col("u").alias("v"), F.col("v").alias("x"), F.col("w").alias("y"))
        .unionAll(
            tri.select(F.col("v").alias("v"), F.col("u").alias("x"), F.col("w").alias("y"))
        )
        .unionAll(
            tri.select(F.col("w").alias("v"), F.col("u").alias("x"), F.col("v").alias("y"))
        )
    )

    out_schema = "members array<long>, size int"

    def kernel(key, nbr_pdf, ego_pdf):
        import pandas as pd

        if len(nbr_pdf) > max_group:
            raise ValueError(
                f"maximal_cliques: vertex {key[0]} ego net has "
                f"{len(nbr_pdf)} neighbors > max_group={max_group}; "
                "raise max_group or pre-filter hubs"
            )
        v = int(key[0])
        fwd = nbr_pdf["u_fwd"].to_numpy()
        us = nbr_pdf["u"].to_numpy()
        P = set(int(u) for u in us[fwd])
        X = set(int(u) for u in us[~fwd])
        adj: dict = {}
        for x, y in zip(ego_pdf["x"].to_numpy(), ego_pdf["y"].to_numpy()):
            x, y = int(x), int(y)
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        found: list = []
        _bron_kerbosch(adj, [v], P, X, found)
        rows = [(members, len(members)) for members in found]
        return pd.DataFrame(rows, columns=["members", "size"])

    grouped = nbrs.groupBy("v").cogroup(ego.groupBy("v"))
    cliques = grouped.applyInPandas(kernel, out_schema)

    # isolated vertices never appear in nbrs: they are their own
    # maximal 1-cliques
    from graftlink.vertices import vertex_universe

    touched = nbrs.select(F.col("v").alias("id")).distinct()
    singles = (
        vertex_universe(edges)
        .join(touched, "id", "left_anti")
        .select(F.array("id").alias("members"), F.lit(1).alias("size"))
    )
    allc = cliques.unionAll(singles)
    if min_size > 1:
        allc = allc.where(F.col("size") >= min_size)
    if max_size is not None:
        allc = allc.where(F.col("size") <= max_size)
    return allc


def clique_number(edges: DataFrame) -> DataFrame:
    """One-row DF[clique_number int] — size of the largest clique
    (igraph_clique_number)."""
    return maximal_cliques(edges).agg(
        F.coalesce(F.max("size"), F.lit(0)).alias("clique_number")
    )


def largest_cliques(edges: DataFrame) -> DataFrame:
    """DF[members, size] — all maximum-size cliques
    (igraph_largest_cliques): one scalar-agg pass for the max, then a
    broadcast filter (two jobs, no window)."""
    mc = maximal_cliques(edges)
    mx = mc.agg(F.max("size").alias("mx"))
    return (
        mc.crossJoin(F.broadcast(mx))
        .where(F.col("size") == F.col("mx"))
        .select("members", "size")
    )


def clique_size_distribution(edges: DataFrame, min_size: int = 1) -> DataFrame:
    """DF[size int, n_cliques long] — maximal-clique histogram."""
    return (
        maximal_cliques(edges, min_size=min_size)
        .groupBy("size")
        .agg(F.count("*").alias("n_cliques"))
    )


def _clique_level_ctes(clean: str, k_max: int) -> list[str]:
    """Shared incremental CTE chain for the bounded-k twins: c{k} =
    ascending-member k-cliques built from c{k-1} via the extension
    table ext{k-1} (every vertex u adjacent to ALL k-1 members —
    an unnest + equi-join + HAVING count = k-1, NO k-way self-join, so
    the cost is output-sensitive like the Spark side instead of
    |V|^k). ext{k} doubles as the maximality test: c{k} rows absent
    from ext{k}.members are maximal."""
    und = (
        f"SELECT least(src, dst) AS a, greatest(src, dst) AS b "
        f"FROM ({clean}) WHERE src <> dst GROUP BY 1, 2"
    )
    parts = [
        f"und AS ({und})",
        "nbr AS (SELECT a AS v, b AS u FROM und "
        "UNION ALL SELECT b, a FROM und)",
        "verts AS (SELECT DISTINCT v FROM nbr)",
        "c1 AS (SELECT [v] AS members FROM verts)",
    ]
    for k in range(1, k_max + 1):
        parts.append(f"""ext{k} AS (
            SELECT cm.members AS members, n.u AS u
            FROM (SELECT members, unnest(members) AS m FROM c{k}) cm
            JOIN nbr n ON cm.m = n.v
            GROUP BY cm.members, n.u HAVING count(*) = {k}
        )""")
        if k < k_max:
            # members stay ascending: only extend past the last member
            parts.append(
                f"c{k + 1} AS (SELECT list_append(members, u) AS members "
                f"FROM ext{k} WHERE u > members[{k}])"
            )
    return parts


def maximal_cliques_sql(clean: str, k_max: int = 8, min_size: int = 1) -> str:
    """DuckDB twin for maximal_cliques (members as a ','-joined string
    so the driver's pandas hash can sort it): grow k-cliques
    incrementally from (k-1)-cliques through the all-members-adjacent
    extension table, keep the levels' rows that no vertex extends.
    Valid while the true clique number is <= k_max; a bigger clique on
    the Spark side would (correctly) flag the divergence."""
    parts = _clique_level_ctes(clean, k_max)
    keeps = [
        f"SELECT members FROM c{k} ANTI JOIN "
        f"(SELECT DISTINCT members FROM ext{k}) x{k} USING (members)"
        for k in range(1, k_max + 1)
    ]
    allm = " UNION ALL ".join(keeps)
    with_parts = ",\n".join(parts)
    return f"""
        WITH {with_parts},
        allm AS ({allm})
        SELECT array_to_string(members, ',') AS members,
               CAST(len(members) AS BIGINT) AS size
        FROM allm WHERE len(members) >= {min_size}
    """


def clique_number_sql(clean: str, k_max: int = 8) -> str:
    """DuckDB twin for clique_number, valid while the true clique
    number is <= k_max: answer = deepest non-empty level of the same
    incremental k-clique chain. The Spark side has no such bound — if
    the graph's clique number exceeded k_max the driver hash would
    (correctly) flag the divergence."""
    parts = _clique_level_ctes(clean, k_max)
    counts = " UNION ALL ".join(
        f"SELECT {k} AS k, count(*) > 0 AS present FROM c{k}"
        for k in range(1, k_max + 1)
    )
    with_parts = ",\n".join(parts)
    return f"""
        WITH {with_parts},
        lv AS ({counts})
        SELECT CAST(coalesce(max(k), 0) AS INT) AS clique_number
        FROM lv WHERE present
    """
