"""Bow-tie decomposition of a directed web graph (Broder et al. 2000,
"Graph structure in the Web", Computer Networks 33(1-6):309-320).

igraph ships no bow-tie API, but this is the link-graph analysis the
Common-Crawl tier exists for: classify every url into

- CORE          — the largest SCC (ties broken to the smallest
                  min-member label, deterministic),
- IN            — reaches CORE but is not in it,
- OUT           — reachable from CORE but not in it,
- TUBE          — on an IN -> OUT path that avoids CORE,
- TENDRIL       — the rest of CORE's weak component (hangs off IN,
                  dangles into OUT, or attaches to those; Broder's
                  TENDRILS with the unlabeled weak-component remainder
                  folded in, the standard operationalization),
- DISCONNECTED  — outside CORE's weak component.

Spark shape (the 100 TB contract):
- one SCC call (the engine's trim+color+backward kernel,
  graftlink/scc.py) + one 1-row agg to elect the core;
- five frontier-superstep reachability sweeps (forward, backward,
  forward-from-IN / backward-from-OUT on the core-free subgraph,
  undirected from CORE), each the CC/BFS kernel shape: packed-
  adjacency join + distinct + anti-join vs visited, shuffle_hash
  hints, localCheckpoint lineage cuts — a (source, id) closure never
  materializes, only frontier + visited sets;
- final labeling is one chain of left joins on id over the vertex
  universe feeding a CASE — no Window, and the only collects are the
  1-row core election and per-level emptiness checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graftlink.adjacency import pack_adjacency
from graftlink.iterative_sql import _prelude

REGIONS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISCONNECTED")


def _reach_set(
    adj: DataFrame, seeds: DataFrame, buckets: int, max_depth: int
) -> DataFrame:
    """DF[id] — every vertex reachable from the seed SET (seeds
    included) over the packed adjacency; union-of-sources semantics,
    so state is one frontier + one visited set regardless of |seeds|."""
    frontier = (
        seeds.select("id").repartition(buckets, "id").localCheckpoint(eager=True)
    )
    visited = frontier
    for _ in range(max_depth):
        nxt = (
            adj.select("src", "neighbors")
            .join(frontier.hint("shuffle_hash"), adj["src"] == frontier["id"])
            .select(F.explode("neighbors").alias("id"))
            .distinct()
            .join(visited.hint("shuffle_hash"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return visited
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(
        f"bowtie: reachability frontier still growing at max_depth={max_depth}"
    )


def bowtie_decomposition(
    edges: DataFrame,
    max_depth: int = 300,
    buckets: int | None = None,
) -> DataFrame:
    """edges DF[src,dst] (directed) -> DF[id, region] with region in
    REGIONS. See module docstring for the taxonomy."""
    from graftlink.scc import strongly_connected_components
    from graftlink.vertices import vertex_universe

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    clean = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = vertex_universe(clean).localCheckpoint(eager=True)
    if verts.isEmpty():
        return spark.createDataFrame([], "id long, region string")

    # core election: largest SCC, ties -> smallest min-member label
    scc = strongly_connected_components(clean, renumber=False).localCheckpoint(
        eager=True
    )
    core_lab = (
        scc.groupBy("component")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("component").asc())
        .limit(1)
        .collect()[0]["component"]
    )
    core = (
        scc.where(F.col("component") == F.lit(int(core_lab)))
        .select("id")
        .localCheckpoint(eager=True)
    )

    rev = clean.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd_adj = pack_adjacency(clean, buckets=b).persist()
    bwd_adj = pack_adjacency(rev, buckets=b).persist()
    fwd = _reach_set(fwd_adj, core, b, max_depth)  # includes core
    bwd = _reach_set(bwd_adj, core, b, max_depth)
    out_v = fwd.join(core, "id", "left_anti").localCheckpoint(eager=True)
    in_v = bwd.join(core, "id", "left_anti").localCheckpoint(eager=True)
    fwd_adj.unpersist()
    bwd_adj.unpersist()

    # TUBE detection runs on the core-free subgraph: a tube sits on an
    # IN -> OUT path that never enters CORE
    nc = (
        clean.join(core.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(core.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .localCheckpoint(eager=True)
    )
    nc_rev = nc.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    nc_fwd_adj = pack_adjacency(nc, buckets=b).persist()
    nc_bwd_adj = pack_adjacency(nc_rev, buckets=b).persist()
    from_in = _reach_set(nc_fwd_adj, in_v, b, max_depth)
    to_out = _reach_set(nc_bwd_adj, out_v, b, max_depth)
    nc_fwd_adj.unpersist()
    nc_bwd_adj.unpersist()

    # CORE's weak component separates TENDRIL from DISCONNECTED
    wadj = pack_adjacency(clean.unionByName(rev), buckets=b).persist()
    wcc = _reach_set(wadj, core, b, max_depth)
    wadj.unpersist()

    def _flag(d: DataFrame, name: str) -> DataFrame:
        return d.select("id").withColumn(name, F.lit(True))

    return (
        verts.join(_flag(core, "is_core"), "id", "left")
        .join(_flag(out_v, "is_out"), "id", "left")
        .join(_flag(in_v, "is_in"), "id", "left")
        .join(_flag(from_in, "f_in"), "id", "left")
        .join(_flag(to_out, "t_out"), "id", "left")
        .join(_flag(wcc, "in_wcc"), "id", "left")
        .select(
            "id",
            F.when(F.col("is_core"), "CORE")
            .when(F.col("is_out"), "OUT")
            .when(F.col("is_in"), "IN")
            .when(F.col("f_in") & F.col("t_out"), "TUBE")
            .when(F.col("in_wcc"), "TENDRIL")
            .otherwise("DISCONNECTED")
            .alias("region"),
        )
    )


def bowtie_census(
    edges: DataFrame, max_depth: int = 300, buckets: int | None = None
) -> DataFrame:
    """DF[region, cnt] — the Broder headline table (what fraction of
    the web sits in each bow-tie region)."""
    return (
        bowtie_decomposition(edges, max_depth, buckets)
        .groupBy("region")
        .agg(F.count("*").alias("cnt"))
    )


def bowtie_sql(clean: str) -> str:
    """DuckDB twin: the same taxonomy from first principles — full
    directed transitive closure for the SCC/core election (the
    scc_sql spec), then set-growing recursive CTEs for each
    reachability sweep. Exact (no depth cap: UNION-dedup set growth
    terminates at the fixpoint)."""
    return f"""
        WITH RECURSIVE
        {_prelude(clean)},
        reach(a, b) AS (
            SELECT id, id FROM verts
            UNION
            SELECT r.a, e.dst FROM reach r JOIN clean e ON e.src = r.b
        ),
        scc AS (
            SELECT f.a AS id, min(f.b) AS label
            FROM reach f JOIN reach g ON f.a = g.b AND f.b = g.a
            GROUP BY f.a
        ),
        core_lab AS (
            SELECT label FROM (
                SELECT label, count(*) AS n FROM scc GROUP BY label
            ) ORDER BY n DESC, label ASC LIMIT 1
        ),
        core AS (SELECT id FROM scc WHERE label = (SELECT label FROM core_lab)),
        fwd AS (
            SELECT DISTINCT r.b AS id FROM reach r
            JOIN core c ON r.a = c.id
        ),
        bwd AS (
            SELECT DISTINCT r.a AS id FROM reach r
            JOIN core c ON r.b = c.id
        ),
        outv AS (SELECT id FROM fwd WHERE id NOT IN (SELECT id FROM core)),
        inv AS (SELECT id FROM bwd WHERE id NOT IN (SELECT id FROM core)),
        nclean AS (
            SELECT src, dst FROM clean
            WHERE src NOT IN (SELECT id FROM core)
              AND dst NOT IN (SELECT id FROM core)
        ),
        from_in(id) AS (
            SELECT id FROM inv
            UNION
            SELECT e.dst FROM from_in f JOIN nclean e ON e.src = f.id
        ),
        to_out(id) AS (
            SELECT id FROM outv
            UNION
            SELECT e.src FROM to_out t JOIN nclean e ON e.dst = t.id
        ),
        und AS (
            SELECT src, dst FROM clean
            UNION
            SELECT dst, src FROM clean
        ),
        wcc(id) AS (
            SELECT id FROM core
            UNION
            SELECT e.dst FROM wcc w JOIN und e ON e.src = w.id
        )
        SELECT v.id,
               CASE
                 WHEN v.id IN (SELECT id FROM core) THEN 'CORE'
                 WHEN v.id IN (SELECT id FROM outv) THEN 'OUT'
                 WHEN v.id IN (SELECT id FROM inv) THEN 'IN'
                 WHEN v.id IN (SELECT id FROM from_in)
                  AND v.id IN (SELECT id FROM to_out) THEN 'TUBE'
                 WHEN v.id IN (SELECT id FROM wcc) THEN 'TENDRIL'
                 ELSE 'DISCONNECTED'
               END AS region
        FROM verts v
    """


def bowtie_census_sql(clean: str) -> str:
    return f"""
        SELECT region, count(*) AS cnt
        FROM ({bowtie_sql(clean)})
        GROUP BY region
    """
