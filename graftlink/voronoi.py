"""Voronoi community detection (igraph `community_voronoi` anchor).

igraph 0.10 added Voronoi partitioning communities (Deritei et al.
2014, "Community detection by graph Voronoi diagrams", New J. Phys.):
pick generator vertices in locally dense regions, give every edge a
length that SHRINKS with local density, and assign each vertex to the
generator with the smallest weighted graph distance — communities are
the Voronoi cells of the density-weighted metric.

Ours is a deterministic, fully integer-arithmetic restatement of that
recipe (the LPA precedent: we own the spec where upstream's is
heuristic/sequential; deviations documented here):

- local relative density of v over the CLOSED 1-neighborhood N[v]:
      rho(v) = w_int / (edges touching N[v])
             = (deg(v) + tri(v)) / (sdeg(v) + deg(v) - (deg(v)+tri(v)))
  where tri(v) = adjacent-triangle count and sdeg(v) = sum of
  neighbor degrees — both existing engine primitives. rho is a ratio
  of two integers, so all density COMPARISONS are exact (a/b vs c/d
  as a*d vs c*b); for edge lengths it is quantized once:
      q(v) = (Q * w_int) div denom  in [0, Q],  Q = 64.
- generators ("seeds"): the local density maxima — v is a seed iff
  (q, id) of v beats every neighbor's (q(u) smaller, or equal-q and
  larger id). One join + partial-agg max — fully parallel, replacing
  igraph's sequential greedy seed sweep (documented deviation);
  every finite component contains its priority maximum, so every
  vertex is reachable from some seed, and isolated vertices seed
  themselves.
- edge length: len(u,v) = 2Q + 1 - q(u) - q(v) in [1, 2Q+1] —
  integer, dense regions short, exactly the paper's monotone-in-
  density requirement.
- assignment: multi-source integer SSSP where state carries the
  (dist, seed) pair and relaxation takes the lexicographic min —
  deterministic tie-break on seed id. All state is long; results are
  bit-exact across engines and partitionings.

Scale shape: densities cost one triangle pass + two degree joins
(all partial-agg); the assignment loop is the engine's standard
frontier relaxation — messages only from vertices improved last
round, min-struct combines map-side, round count bounded by the
weighted hop diameter. Nothing is sequential, nothing enumerates.

DuckDB twin: densities/seeds are plain SQL; the SSSP is the
UNROLLED-LAYER pattern (Borůvka/rewire precedent) with the (dist,
seed) pair packed into one bigint (dist * PACK + seed, PACK > max
id) so per-layer argmin is a single integer min().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.lineage import cut

Q = 64  # density quantization steps
PACK = 1 << 40  # packed = dist * PACK + seed; requires ids < 2^40


def _und(edges: DataFrame) -> DataFrame:
    """Distinct undirected pairs a<b from a directed edge table."""
    a = F.least("src", "dst").alias("a")
    b = F.greatest("src", "dst").alias("b")
    return (
        edges.where(F.col("src") != F.col("dst")).select(a, b).distinct()
    )


def _sym(und: DataFrame) -> DataFrame:
    return und.select("a", "b").unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def local_relative_density(edges: DataFrame) -> DataFrame:
    """DF[id, w_int, denom, q] — exact integer density terms over the
    closed 1-neighborhood (module docstring formula)."""
    from graftlink.triangles import triangles_per_vertex
    from graftlink.vertices import vertex_universe

    und = _und(edges)
    sym = _sym(und)
    verts = vertex_universe(edges)
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count("*").alias("deg"))
    tri = triangles_per_vertex(edges, vertices=verts)
    # sdeg(v) = sum of neighbor degrees
    sdeg = (
        sym.join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .groupBy(F.col("a").alias("id"))
        .agg(F.sum("db").alias("sdeg"))
    )
    d = (
        verts.join(deg, "id", "left")
        .join(tri, "id", "left")
        .join(sdeg, "id", "left")
        .select(
            "id",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.coalesce("triangles", F.lit(0)).alias("tri"),
            F.coalesce("sdeg", F.lit(0)).alias("sdeg"),
        )
    )
    w_int = F.col("deg") + F.col("tri")
    denom = F.col("sdeg") + F.col("deg") - w_int
    return d.select(
        "id",
        w_int.alias("w_int"),
        denom.alias("denom"),
        F.when(denom > 0, F.expr(f"div({Q} * (deg + tri), sdeg + deg - (deg + tri))"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("q"),
    )


def voronoi_seeds(edges: DataFrame, dens: DataFrame | None = None) -> DataFrame:
    """DF[id] — the local density maxima under (q desc, id asc)
    priority; isolated vertices included."""
    dens = dens if dens is not None else local_relative_density(edges)
    sym = _sym(_und(edges))
    nbr_q = (
        sym.join(dens.select(F.col("id").alias("b"), F.col("q").alias("qb")), "b")
        .join(dens.select(F.col("id").alias("a"), F.col("q").alias("qa")), "a")
        .withColumn(
            "beaten",
            (F.col("qb") > F.col("qa"))
            | ((F.col("qb") == F.col("qa")) & (F.col("b") < F.col("a"))),
        )
        .groupBy(F.col("a").alias("id"))
        .agg(F.max("beaten").alias("any_beats"))
    )
    return (
        dens.select("id")
        .join(nbr_q, "id", "left")
        .where(~F.coalesce("any_beats", F.lit(False)))
        .select("id")
    )


def voronoi_communities(
    edges: DataFrame,
    max_rounds: int = 10_000,
    stats: dict | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
    buckets: int | None = None,
) -> DataFrame:
    """DF[id, community, dist] — the Voronoi cell (seed id) and the
    integer density-weighted distance to it, for every vertex
    reachable from the edge table's vertex universe.

    Per-round state DF[id, packed, _chg] is durably checkpointed with
    lineage (north-rule resume contract); the saved _chg flags ARE
    the frontier, so a killed run resumes with the exact frontier of
    the interrupted round (density/length tables are pure functions
    of the edges and rebuild). The per-round changed-count folds into
    the state-save job (stats-in-save discipline)."""
    from graftlink.checkpoint import CheckpointManager

    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    dens = cut(local_relative_density(edges), eager=True)
    seeds = voronoi_seeds(edges, dens)
    qmap = dens.select("id", "q")
    lens = (
        _sym(_und(edges))
        .join(qmap.select(F.col("id").alias("a"), F.col("q").alias("qa")), "a")
        .join(qmap.select(F.col("id").alias("b"), F.col("q").alias("qb")), "b")
        .select(
            "a",
            "b",
            (F.lit(2 * Q + 1) - F.col("qa") - F.col("qb")).alias("len"),
        )
    )
    lens = cut(lens, eager=True)
    mgr = CheckpointManager(
        checkpoint_dir, "voronoi", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=b,
    )

    start_round = 1
    state = frontier = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_round = found[0] + 1
            loaded = mgr.load(found[0], "id")
            state = loaded.select("id", "packed")
            frontier = loaded.where(F.col("_chg")).select("id", "packed")
    if state is None:
        # state: packed = dist * PACK + seed; dist 0 => packed = seed
        state = cut(
            seeds.select("id", (F.col("id")).alias("packed")), eager=True
        )
        frontier = state
    rounds = start_round - 1
    for rnd in range(start_round, max_rounds + 1):
        rounds = rnd
        # name-based resolution: after a save() the frontier's plan
        # CONTAINS lens (persist keeps lineage), so dataset-qualified
        # lens["a"]/lens["b"] trip the ambiguous-self-join analyzer;
        # the output names (id,packed) vs (a,b,len) are disjoint, so
        # plain column names resolve uniquely
        msgs = (
            frontier.join(lens.hint("shuffle_hash"), F.col("id") == F.col("a"))
            .select(
                F.col("b").alias("id"),
                # integer div/mod only: float division of a 53-bit-plus
                # packed value would silently round
                F.expr(f"(packed div {PACK} + len) * {PACK} + packed % {PACK}").alias(
                    "packed"
                ),
            )
            .groupBy("id")
            .agg(F.min("packed").alias("packed"))
        )
        relaxed = (
            state.select("id", "packed")
            .unionByName(msgs)
            .groupBy("id")
            .agg(F.min("packed").alias("packed"))
        )
        flagged = relaxed.join(
            state.select(F.col("id"), F.col("packed").alias("_old")).hint(
                "shuffle_hash"
            ),
            "id",
            "left",
        ).select(
            "id",
            "packed",
            (F.col("_old").isNull() | (F.col("packed") < F.col("_old"))).alias(
                "_chg"
            ),
        )
        saved, stats_row = mgr.save(
            flagged, rnd, "id", counters={"round": rnd},
            stats_cols=[F.sum(F.col("_chg").cast("long")).alias("c")],
        )
        changed = stats_row["c"] or 0
        state = saved.select("id", "packed")
        frontier = saved.where(F.col("_chg")).select("id", "packed")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"voronoi did not converge in {max_rounds} rounds")
    if stats is not None:
        stats["rounds"] = rounds
    out = state.select(
        "id",
        (F.col("packed") % PACK).alias("community"),
        F.expr(f"packed div {PACK}").alias("dist"),
    )
    return mgr.finalize(out)


# ---------------------------------------------------------------------------
# DuckDB twin (unrolled layers)
# ---------------------------------------------------------------------------


def voronoi_sql(clean: str, rounds: int = 60) -> str:
    """Twin of voronoi_communities over a clean(src,dst) CTE body.

    Densities/seeds are direct SQL restatements; the assignment is
    `rounds` unrolled relaxation layers over the packed (dist, seed)
    bigint — exact provided the Spark loop converges within `rounds`
    (weighted hop diameter; generous for the driver fixtures)."""
    layers = []
    prev = "l0"
    for i in range(1, rounds + 1):
        cur = f"l{i}"
        layers.append(
            f"""{cur} AS MATERIALIZED (
            SELECT id, min(packed) AS packed FROM (
                SELECT id, packed FROM {prev}
                UNION ALL
                SELECT e.b AS id,
                       ((p.packed // {PACK}) + e.len) * {PACK}
                       + p.packed % {PACK} AS packed
                FROM {prev} p JOIN lens e ON e.a = p.id
            ) GROUP BY id
        )"""
        )
        prev = cur
    layer_sql = ",\n        ".join(layers)
    return f"""
        WITH
        clean AS ({clean}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM clean WHERE src <> dst
        ),
        sym AS MATERIALIZED (
            SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
        ),
        verts AS (
            SELECT DISTINCT id FROM (
                SELECT src AS id FROM clean UNION ALL SELECT dst FROM clean
            )
        ),
        deg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM sym GROUP BY a),
        tri AS (
            SELECT id, count(*) AS tri FROM (
                SELECT t.u AS id FROM (
                    SELECT e1.a AS u, e1.b AS v, e2.b AS w
                    FROM und e1
                    JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                    JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
                ) t
                UNION ALL
                SELECT t.v FROM (
                    SELECT e1.a AS u, e1.b AS v, e2.b AS w
                    FROM und e1
                    JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                    JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
                ) t
                UNION ALL
                SELECT t.w FROM (
                    SELECT e1.a AS u, e1.b AS v, e2.b AS w
                    FROM und e1
                    JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                    JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
                ) t
            ) GROUP BY id
        ),
        sdeg AS MATERIALIZED (
            SELECT s.a AS id, sum(d.deg) AS sdeg
            FROM sym s JOIN deg d ON d.id = s.b GROUP BY s.a
        ),
        dens AS (
            SELECT v.id,
                   coalesce(d.deg, 0) + coalesce(t.tri, 0) AS w_int,
                   coalesce(sd.sdeg, 0) + coalesce(d.deg, 0)
                   - (coalesce(d.deg, 0) + coalesce(t.tri, 0)) AS denom
            FROM verts v
            LEFT JOIN deg d ON d.id = v.id
            LEFT JOIN tri t ON t.id = v.id
            LEFT JOIN sdeg sd ON sd.id = v.id
        ),
        qv AS MATERIALIZED (
            SELECT id,
                   CASE WHEN denom > 0 THEN ({Q} * w_int) // denom
                        ELSE 0 END AS q
            FROM dens
        ),
        seeds AS (
            SELECT q1.id FROM qv q1
            WHERE NOT EXISTS (
                SELECT 1 FROM sym s JOIN qv q2 ON q2.id = s.b
                WHERE s.a = q1.id
                  AND (q2.q > q1.q OR (q2.q = q1.q AND q2.id < q1.id))
            )
        ),
        lens AS MATERIALIZED (
            SELECT s.a, s.b, {2 * Q + 1} - qa.q - qb.q AS len
            FROM sym s
            JOIN qv qa ON qa.id = s.a
            JOIN qv qb ON qb.id = s.b
        ),
        l0 AS MATERIALIZED (SELECT id, id AS packed FROM seeds),
        {layer_sql}
        SELECT id,
               CAST(packed % {PACK} AS BIGINT) AS community,
               CAST(packed // {PACK} AS BIGINT) AS dist
        FROM {prev}
    """
