"""Girth — shortest cycle length.

igraph surface matched: `igraph_girth` (igraph@0.10.x
src/properties/girth.c [unverified file]) — igraph runs the
Itai–Rodeh O(nm) per-root BFS closure; the distributed formulation
below batches ALL roots through one level-synchronous forward pass
(the same (source, id)-keyed superstep family as betweenness/
multi-source BFS) and reads the answer off two edge joins.

Candidate rule (per root r, over simple undirected edges (u, v)):

  dist_r(u) == dist_r(v)             ->  2*dist + 1
      (the closed walk r..u-v..r has ODD length, and every closed
       walk of odd length contains an odd cycle no longer than it)
  dist_r(v) == dist_r(u) + 1 AND sigma_r(v) > sigma_r(u)
                                     ->  dist_r(u) + dist_r(v) + 1
      (sigma = number of shortest paths, the Brandes forward count.
       sigma_r(v) > sigma_r(u) certifies a shortest r..v path whose
       last hop is NOT u — so the union of the two routes contains a
       genuine cycle of length <= the candidate. Without the sigma
       guard the walk can be fully degenerate (r..u-v then back over
       the same edge) and the naive candidate UNDERcounts.)

Soundness: every accepted candidate bounds a real cycle from above,
so min >= girth. Attainment: root r ON a shortest cycle C_g sees, for
odd g, the antipodal same-level edge (candidate exactly g); for even
g, the antipodal vertex w has two cycle parents, hence
sigma(w) >= 2*sigma(parent-side) > sigma(u) (candidate exactly g).
So the min over ALL roots is EXACT. `roots=` restricts to a sample:
the result is then an upper bound (inf-safe), the declared web-scale
envelope — exact girth is Theta(nm) by the ALGORITHM (igraph pays the
same), mirroring the walktrap precedent.

Multigraph view: a self-loop is a 1-cycle, a parallel pair a 2-cycle
(checked first with two scalar aggs); the BFS pass then runs on the
canonical simple graph.

Shape: the forward pass is depth supersteps over (source, id) state —
one packed-adjacency hash join + one partial-agg sum per level,
frontier-sized frames, localCheckpoint per level. The candidate scan
is two broadcast/shuffle-hash joins of the edge list against the
distance table and one scalar min. No windows, no sorts, no
driver-side loops over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.adjacency import pack_adjacency


def girth(
    edges: DataFrame,
    roots: list[int] | None = None,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """One-row DF[girth] — length of the shortest cycle of the
    undirected multigraph view; NULL when the graph is acyclic
    (igraph returns infinity). Exact with roots=None (all vertices,
    Theta(nm) — igraph's own cost); with a root sample the value is
    an upper bound."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))

    loops = edges.where(F.col("src") == F.col("dst")).limit(1).count()
    if loops:
        return spark.createDataFrame([(1,)], "girth long")
    pairs = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).groupBy("a", "b").agg(F.count("*").alias("mult"))
    par = pairs.where(F.col("mult") >= 2).limit(1).count()
    if par:
        return spark.createDataFrame([(2,)], "girth long")

    und = pairs.select("a", "b")
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = pack_adjacency(sym, buckets=b).persist()

    if roots is None:
        seeds = vertex_universe(edges).select(F.col("id").alias("source"))
    else:
        seeds = spark.createDataFrame(
            [(int(r),) for r in roots], "source long"
        )
    # state: (source, id, dist, sigma) — Brandes forward counts
    state = seeds.select(
        "source",
        F.col("source").alias("id"),
        F.lit(0).cast("int").alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
    ).repartition(b, "id").localCheckpoint(eager=True)
    frontier = state
    for depth in range(1, max_depth + 1):
        msgs = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"])
            .select("source", F.explode("neighbors").alias("id"), "sigma")
        )
        nxt = (
            msgs.groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .join(
                state.select("source", "id").hint("shuffle_hash"),
                ["source", "id"],
                "left_anti",
            )
            .withColumn("dist", F.lit(depth).cast("int"))
            .select("source", "id", "dist", "sigma")
            .localCheckpoint(eager=True)
        )
        if not nxt.limit(1).count():
            break
        state = state.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(
            f"girth forward pass still growing at max_depth={max_depth}"
        )
    adj.unpersist()

    du = state.select(
        F.col("source").alias("_s1"),
        F.col("id").alias("_u"),
        F.col("dist").alias("du"),
        F.col("sigma").alias("su"),
    )
    dv = state.select(
        F.col("source").alias("_s2"),
        F.col("id").alias("_v"),
        F.col("dist").alias("dv"),
        F.col("sigma").alias("sv"),
    )
    cand = (
        sym.join(du, sym["src"] == du["_u"])
        .join(dv, (du["_s1"] == dv["_s2"]) & (sym["dst"] == dv["_v"]))
        .where(
            (F.col("du") == F.col("dv"))
            | ((F.col("dv") == F.col("du") + 1) & (F.col("sv") > F.col("su")))
        )
        .select((F.col("du") + F.col("dv") + 1).cast("long").alias("g"))
    )
    return cand.agg(F.min("g").alias("girth"))


def girth_sql(clean: str, max_depth: int = 300) -> str:
    """DuckDB twin, algorithm-INDEPENDENT: for every simple edge e,
    girth-through-e = (shortest path between its endpoints AVOIDING e)
    + 1; the girth is the min over edges (plus the self-loop /
    parallel-edge short-circuits). reach(eid, node, d) runs one BFS
    per excluded edge."""
    return f"""
        WITH RECURSIVE
        clean AS ({clean}),
        loops AS (SELECT count(*) AS c FROM clean WHERE src = dst),
        pairs AS (
            SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                   count(*) AS mult
            FROM clean WHERE src <> dst GROUP BY 1, 2
        ),
        par AS (SELECT count(*) AS c FROM pairs WHERE mult >= 2),
        ed AS (
            SELECT row_number() OVER (ORDER BY a, b) AS eid, a, b
            FROM pairs
        ),
        nb AS (
            SELECT a AS u, b AS v FROM pairs
            UNION ALL SELECT b, a FROM pairs
        ),
        reach(eid, node, d) AS (
            SELECT eid, a, 0 FROM ed
            UNION
            SELECT r.eid, n.v, r.d + 1
            FROM reach r
            JOIN nb n ON n.u = r.node
            JOIN ed ON ed.eid = r.eid
            WHERE r.d < {max_depth}
              AND NOT (least(n.u, n.v) = ed.a AND greatest(n.u, n.v) = ed.b)
        ),
        best AS (
            SELECT r.eid, min(r.d) + 1 AS g
            FROM reach r JOIN ed ON ed.eid = r.eid AND ed.b = r.node
            GROUP BY r.eid
        ),
        simple_g AS (SELECT min(g) AS g FROM best)
        SELECT CASE
                 WHEN (SELECT c FROM loops) > 0 THEN 1
                 WHEN (SELECT c FROM par) > 0 THEN 2
                 ELSE (SELECT g FROM simple_g)
               END AS girth
    """


def eccentricity_all(
    edges: DataFrame,
    roots: list[int] | None = None,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, ecc] — EXACT eccentricity of every vertex (igraph
    `eccentricity`, mode=all): max distance to any REACHABLE vertex
    (per-component semantics, igraph unconn=True). Same batched
    all-roots forward pass as girth() minus the sigma counts —
    declared Theta(nm) envelope (igraph pays the same); `roots=`
    restricts to a sample of CENTERS (their exact eccentricities; the
    scale path, like the existing sampled eccentricity_harmonic)."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = pack_adjacency(sym, buckets=b).persist()
    if roots is None:
        seeds = vertex_universe(edges).select(F.col("id").alias("source"))
    else:
        seeds = spark.createDataFrame([(int(r),) for r in roots], "source long")
    # running per-source max distance folds level by level: only the
    # frontier and the k-row ecc accumulator persist, never the full
    # (source, id) closure
    frontier = seeds.select(
        "source", F.col("source").alias("id"), F.lit(0).cast("int").alias("dist")
    ).repartition(b, "id").localCheckpoint(eager=True)
    visited = frontier.select("source", "id").localCheckpoint(eager=True)
    ecc = seeds.select("source", F.lit(0).cast("int").alias("ecc"))
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"])
            .select("source", F.explode("neighbors").alias("id"))
            .distinct()
            .join(visited.hint("shuffle_hash"), ["source", "id"], "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
            .localCheckpoint(eager=True)
        )
        if not nxt.limit(1).count():
            break
        visited = visited.unionByName(
            nxt.select("source", "id")
        ).localCheckpoint(eager=True)
        reached = nxt.select("source").distinct().withColumn(
            "e2", F.lit(depth).cast("int")
        )
        ecc = (
            ecc.join(reached, "source", "left")
            .select("source", F.greatest("ecc", F.coalesce("e2", F.col("ecc"))).alias("ecc"))
            .localCheckpoint(eager=True)
        )
        frontier = nxt
    else:
        raise RuntimeError(
            f"eccentricity BFS still growing at max_depth={max_depth}"
        )
    adj.unpersist()
    return ecc.select(F.col("source").alias("id"), F.col("ecc").cast("long").alias("ecc"))


def radius_diameter(
    edges: DataFrame,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """One-row DF[radius, diameter] — min / max EXACT eccentricity
    over all vertices (igraph `radius` / `diameter` with
    unconn=True reachable-set semantics)."""
    ecc = eccentricity_all(edges, None, max_depth, buckets)
    return ecc.agg(
        F.min("ecc").alias("radius"), F.max("ecc").alias("diameter")
    )


def eccentricity_all_sql(clean: str, max_depth: int = 16) -> str:
    """DuckDB twin: transitive-closure distances, per-source max."""
    return f"""
        WITH RECURSIVE
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
        reach(source, node, d) AS (
            -- plain UNION dedup (a recursive CTE cannot re-query its
            -- own working set, so min-distance pruning is impossible
            -- here); states are (source, node, d<=cap) triples, which
            -- is why the twin takes a SMALL depth cap: it is exact
            -- whenever every eccentricity <= cap, which the Spark
            -- result itself pins (driver hash compare)
            SELECT id, id, 0 FROM verts
            UNION
            SELECT r.source, n.v, r.d + 1
            FROM reach r JOIN nb n ON n.u = r.node
            WHERE r.d < {max_depth}
        ),
        dist AS (SELECT source, node, min(d) AS d FROM reach GROUP BY 1, 2)
        SELECT source AS id, max(d) AS ecc FROM dist GROUP BY source
    """


def radius_diameter_sql(clean: str, max_depth: int = 16) -> str:
    return f"""
        SELECT min(ecc) AS radius, max(ecc) AS diameter
        FROM ({eccentricity_all_sql(clean, max_depth)})
    """


def path_length_stats(
    edges: DataFrame,
    roots: list[int] | None = None,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """One-row DF[avg_path_length, global_efficiency, reachable_pairs]
    — igraph `average_path_length(unconn=True)` (mean hop distance
    over ordered REACHABLE pairs) and `global_efficiency` (mean 1/d
    over ALL ordered pairs, unreachable pairs contributing 0) on the
    simple undirected view.

    Same batched all-roots forward pass as eccentricity_all; the
    per-level fold is three Python scalars (pairs, hop-sum,
    inverse-sum), so the (source, id) closure never materializes —
    only frontier + visited anti-join state. Declared Theta(nm)
    envelope (igraph pays the same for the exact value); `roots=`
    samples source vertices for the scale path (the returned stats
    become the sampled-source estimate; the efficiency denominator
    scales to |roots| * (n-1))."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = pack_adjacency(sym, buckets=b).persist()
    uni = vertex_universe(edges)
    n = uni.count()
    if roots is None:
        seeds = uni.select(F.col("id").alias("source"))
        k = n
    else:
        seeds = spark.createDataFrame([(int(r),) for r in roots], "source long")
        k = seeds.count()
    frontier = seeds.select(
        "source", F.col("source").alias("id")
    ).repartition(b, "id").localCheckpoint(eager=True)
    visited = frontier
    pairs = 0
    hop_sum = 0
    inv_sum = 0.0
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"])
            .select("source", F.explode("neighbors").alias("id"))
            .distinct()
            .join(visited.hint("shuffle_hash"), ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        c = nxt.count()
        if not c:
            break
        pairs += c
        hop_sum += depth * c
        inv_sum += c / depth
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(
            f"path_length_stats BFS still growing at max_depth={max_depth}"
        )
    adj.unpersist()
    apl = (hop_sum / pairs) if pairs else float("nan")
    geff = (inv_sum / (k * (n - 1))) if n > 1 else 0.0
    return spark.createDataFrame(
        [(float(apl), float(geff), int(pairs))],
        "avg_path_length double, global_efficiency double, reachable_pairs long",
    )


def path_length_stats_sql(clean: str, max_depth: int = 16) -> str:
    """DuckDB twin: the eccentricity closure's (source, node, min d)
    distances, folded to the two means. Exact whenever every
    eccentricity <= max_depth (pinned by the Spark result itself).
    The inverse-distance sum is grouped per distance value first so
    both engines add <= diameter doubles (and %.6g canonicalization
    absorbs ordering ulps)."""
    return f"""
        WITH RECURSIVE
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
        reach(source, node, d) AS (
            SELECT id, id, 0 FROM verts
            UNION
            SELECT r.source, n.v, r.d + 1
            FROM reach r JOIN nb n ON n.u = r.node
            WHERE r.d < {max_depth}
        ),
        dist AS (
            SELECT source, node, min(d) AS d FROM reach GROUP BY 1, 2
        ),
        lvl AS (
            SELECT d, count(*) AS c FROM dist WHERE d > 0 GROUP BY d
        ),
        n AS (SELECT count(*) AS n FROM verts)
        SELECT
            CAST(sum(d * c) AS DOUBLE) / sum(c) AS avg_path_length,
            -- ordered sum: same increasing-depth addition sequence as
            -- the Spark scalar fold, so the double is bit-identical
            sum(CAST(c AS DOUBLE) / d ORDER BY d)
              / ((SELECT n FROM n) * ((SELECT n FROM n) - 1))
              AS global_efficiency,
            CAST(sum(c) AS BIGINT) AS reachable_pairs
        FROM lvl
    """


def harmonic_all(
    edges: DataFrame,
    normalized: bool = False,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, harmonic] — EXACT harmonic centrality of every vertex
    (igraph `harmonic_centrality`, mode=all): sum of 1/d(v,u) over
    reachable u != v on the simple undirected view; normalized=True
    divides by n-1 (igraph's normalized form). The existing
    eccentricity_harmonic_from_sources row remains the sampled scale
    path; this is the exact all-roots form — same batched BFS as
    eccentricity_all, with a per-source SUM accumulator folding level
    by level (the closure never materializes)."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = pack_adjacency(sym, buckets=b).persist()
    uni = vertex_universe(edges)
    n = uni.count()
    seeds = uni.select(F.col("id").alias("source"))
    frontier = seeds.select(
        "source", F.col("source").alias("id")
    ).repartition(b, "id").localCheckpoint(eager=True)
    visited = frontier
    acc = seeds.select("source", F.lit(0.0).alias("harmonic"))
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"])
            .select("source", F.explode("neighbors").alias("id"))
            .distinct()
            .join(visited.hint("shuffle_hash"), ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = nxt.groupBy("source").agg(
            (F.count("*") / F.lit(float(depth))).alias("h2")
        )
        acc = (
            acc.join(reached, "source", "left")
            .select(
                "source",
                (F.col("harmonic") + F.coalesce("h2", F.lit(0.0))).alias("harmonic"),
            )
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(
            nxt.select("source", "id")
        ).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(
            f"harmonic_all BFS still growing at max_depth={max_depth}"
        )
    adj.unpersist()
    denom = float(n - 1) if (normalized and n > 1) else 1.0
    return acc.select(
        F.col("source").alias("id"),
        (F.col("harmonic") / F.lit(denom)).alias("harmonic"),
    )


def harmonic_all_sql(clean: str, max_depth: int = 16) -> str:
    """DuckDB twin: the eccentricity closure's min-distances, folded
    per source. The inverse sum is grouped per (source, d) first so
    both engines add <= diameter doubles per vertex (and the driver's
    %.6g canonicalization absorbs ordering ulps)."""
    return f"""
        WITH RECURSIVE
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
        reach(source, node, d) AS (
            SELECT id, id, 0 FROM verts
            UNION
            SELECT r.source, n.v, r.d + 1
            FROM reach r JOIN nb n ON n.u = r.node
            WHERE r.d < {max_depth}
        ),
        dist AS (SELECT source, node, min(d) AS d FROM reach GROUP BY 1, 2),
        lvl AS (
            SELECT source, d, count(*) AS c FROM dist WHERE d > 0 GROUP BY 1, 2
        ),
        hsum AS (
            -- ORDER BY d inside the aggregate: adds in increasing
            -- depth, the exact sequence the Spark accumulator uses,
            -- so the double is BIT-identical (an unordered parallel
            -- sum can flip a %.6g rounding boundary run-to-run)
            SELECT source, sum(CAST(c AS DOUBLE) / d ORDER BY d) AS harmonic
            FROM lvl GROUP BY source
        )
        SELECT v.id, coalesce(h.harmonic, 0.0) AS harmonic
        FROM verts v LEFT JOIN hsum h ON h.source = v.id
    """


def closeness_all(
    edges: DataFrame,
    normalized: bool = False,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, sum_dist, reachable, closeness] — EXACT closeness
    centrality of every vertex (igraph `closeness`, mode=all,
    reachable-set semantics): raw form 1/sum(d(v,u)) over reachable
    u != v; normalized=True gives the inverse MEAN distance
    reachable/sum_d (igraph's normalized flag). Vertices with no
    reachable peer get NULL (igraph returns NaN there).

    Same batched all-roots BFS as eccentricity_all/harmonic_all with
    two INTEGER per-source accumulators (sum of depths, reachable
    count) folding level by level — the (source, id) closure never
    materializes, and the final division of exact integers is
    bit-deterministic cross-engine. Declared Theta(nm) envelope; the
    sampled closeness_from_sources row remains the web-scale path."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = pack_adjacency(sym, buckets=b).persist()
    seeds = vertex_universe(edges).select(F.col("id").alias("source"))
    frontier = seeds.select(
        "source", F.col("source").alias("id")
    ).repartition(b, "id").localCheckpoint(eager=True)
    visited = frontier
    acc = seeds.select(
        "source",
        F.lit(0).cast("long").alias("sum_dist"),
        F.lit(0).cast("long").alias("reachable"),
    )
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"])
            .select("source", F.explode("neighbors").alias("id"))
            .distinct()
            .join(visited.hint("shuffle_hash"), ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = nxt.groupBy("source").agg(
            F.count("*").alias("_c"),
        )
        acc = (
            acc.join(reached, "source", "left")
            .select(
                "source",
                (
                    F.col("sum_dist")
                    + F.coalesce("_c", F.lit(0)) * F.lit(depth)
                ).cast("long").alias("sum_dist"),
                (F.col("reachable") + F.coalesce("_c", F.lit(0)))
                .cast("long").alias("reachable"),
            )
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(
            nxt.select("source", "id")
        ).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(
            f"closeness_all BFS still growing at max_depth={max_depth}"
        )
    adj.unpersist()
    num = F.col("reachable").cast("double") if normalized else F.lit(1.0)
    return acc.select(
        F.col("source").alias("id"),
        "sum_dist",
        "reachable",
        F.when(F.col("sum_dist") > 0, num / F.col("sum_dist")).alias("closeness"),
    )


def closeness_all_sql(
    clean: str, normalized: bool = False, max_depth: int = 16
) -> str:
    """DuckDB twin: min-distance closure folded to exact integer
    (sum_dist, reachable) per source; the closeness double is one
    division of exact integers — bit-identical cross-engine."""
    num = "CAST(s.reachable AS DOUBLE)" if normalized else "1.0"
    return f"""
        WITH RECURSIVE
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
        reach(source, node, d) AS (
            SELECT id, id, 0 FROM verts
            UNION
            SELECT r.source, n.v, r.d + 1
            FROM reach r JOIN nb n ON n.u = r.node
            WHERE r.d < {max_depth}
        ),
        dist AS (SELECT source, node, min(d) AS d FROM reach GROUP BY 1, 2),
        s AS (
            SELECT source,
                   CAST(sum(d) AS BIGINT) AS sum_dist,
                   CAST(count(*) FILTER (WHERE d > 0) AS BIGINT) AS reachable
            FROM dist GROUP BY source
        )
        SELECT s.source AS id, s.sum_dist, s.reachable,
               CASE WHEN s.sum_dist > 0
                    THEN {num} / s.sum_dist END AS closeness
        FROM s
    """


def center_periphery(
    edges: DataFrame,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, ecc, is_center, is_periphery] — the graph CENTER
    (vertices whose eccentricity equals the radius) and PERIPHERY
    (eccentricity equals the diameter), the classic derived surface
    over igraph `eccentricity`/`radius`/`diameter` (reachable-set
    semantics). One eccentricity_all sweep + a broadcast 1-row
    (radius, diameter) scalar join — all-integer, exact."""
    ecc = eccentricity_all(edges, None, max_depth, buckets)
    rd = ecc.agg(
        F.min("ecc").alias("_r"), F.max("ecc").alias("_d")
    )
    return ecc.crossJoin(F.broadcast(rd)).select(
        "id",
        "ecc",
        (F.col("ecc") == F.col("_r")).alias("is_center"),
        (F.col("ecc") == F.col("_d")).alias("is_periphery"),
    )


def center_periphery_sql(clean: str, max_depth: int = 16) -> str:
    return f"""
        WITH e AS ({eccentricity_all_sql(clean, max_depth)}),
        rd AS (SELECT min(ecc) AS r, max(ecc) AS d FROM e)
        SELECT e.id, e.ecc,
               e.ecc = rd.r AS is_center,
               e.ecc = rd.d AS is_periphery
        FROM e CROSS JOIN rd
    """


def path_length_hist(
    edges: DataFrame,
    roots: list[int] | None = None,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """DF[dist, n_pairs] — igraph `path_length_hist`: how many
    UNORDERED vertex pairs sit at each shortest-path distance on the
    simple undirected view (igraph counts each pair once; the batched
    BFS reaches every ordered pair, so per-depth counts halve — they
    are even by symmetry, checked by the integer division being
    exact in pytest). Same Theta(nm) declared envelope and `roots=`
    sampling as path_length_stats; with roots= the counts are the
    ORDERED (root, target) pair counts (a sample has no symmetry to
    halve)."""
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = pack_adjacency(sym, buckets=b).persist()
    uni = vertex_universe(edges)
    if roots is None:
        seeds = uni.select(F.col("id").alias("source"))
        halve = True
    else:
        seeds = spark.createDataFrame([(int(r),) for r in roots], "source long")
        halve = False
    frontier = seeds.select(
        "source", F.col("source").alias("id")
    ).repartition(b, "id").localCheckpoint(eager=True)
    visited = frontier
    hist: list[tuple[int, int]] = []
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"])
            .select("source", F.explode("neighbors").alias("id"))
            .distinct()
            .join(visited.hint("shuffle_hash"), ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        c = nxt.count()
        if not c:
            break
        hist.append((depth, c // 2 if halve else c))
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(
            f"path_length_hist BFS still growing at max_depth={max_depth}"
        )
    adj.unpersist()
    return spark.createDataFrame(hist or [], "dist int, n_pairs long")


def path_length_hist_sql(clean: str, max_depth: int = 16) -> str:
    """DuckDB twin: per-distance counts of the undirected closure,
    halved (each unordered pair appears in both directions)."""
    return f"""
        WITH RECURSIVE
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
        reach(source, node, d) AS (
            SELECT id, id, 0 FROM verts
            UNION
            SELECT r.source, n.v, r.d + 1
            FROM reach r JOIN nb n ON n.u = r.node
            WHERE r.d < {max_depth}
        ),
        dist AS (
            SELECT source, node, min(d) AS d FROM reach GROUP BY 1, 2
        )
        SELECT CAST(d AS INT) AS dist, CAST(count(*) / 2 AS BIGINT) AS n_pairs
        FROM dist WHERE d > 0 GROUP BY d
    """
