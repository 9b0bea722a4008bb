"""Batch personalized PageRank via synchronous forward push
(Andersen–Chung–Lang's local-push algorithm, the engine restatement).

igraph's `personalized_pagerank` solves one global vector per reset
distribution; the web-scale workload is the OPPOSITE shape — many
seeds, each wanting its LOCALIZED neighborhood vector (related-pages
/ random-walk-sampling recipes à la Pixie/PinSage). Forward push is
the standard algorithm: maintain per (seed, vertex) a settled mass p
and a residual r; each push converts alpha*r into settled mass and
distributes (1-alpha)*r across out-neighbors.

Determinism spec (ours):
- SYNCHRONOUS rounds with eps=0: EVERY positive residual pushes each
  round, so after R rounds p is exactly the R-term Neumann series
      p_R(s) = alpha * sum_{t<R} (1-alpha)^t (P^T)^t e_s
  — a pure function of (graph, seeds, alpha, R) with no threshold
  comparisons whose float boundary could differ between engines.
- dangling vertices teleport their residual back to the SEED (the
  restart vertex), so p_total + r_total == 1 per seed at every round
  (mass conservation — tested).
- each (seed, v) round-residual folds its incoming contributions in
  ASCENDING pusher order (dangling lump as pusher -1), so the double
  sums are bit-portable; the DuckDB twin unrolls R layers with
  `sum(c ORDER BY u)`.

Scale shape: state is SPARSE — rows exist only for (seed, vertex)
pairs inside the seed's R-hop ball, and k seeds share each round's
single frontier join + one partial-free ordered aggregation keyed
(seed, dst) (the ordered fold is the portable-oracle path; at
production scale swap the fold for a plain partial-agg sum — same
split as texthash fast mode). Rounds are fixed, not data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.lineage import cut

PPR_ALPHA = 0.85
PPR_ROUNDS = 10


def ppr_push(
    edges: DataFrame,
    seeds: list[int],
    alpha: float = PPR_ALPHA,
    rounds: int = PPR_ROUNDS,
    ordered: bool = True,
    checkpoint_dir: str | None = None,
    checkpoint_mode: str = "durable",
    resume: bool = False,
    fingerprint: str = "",
    buckets: int | None = None,
) -> DataFrame:
    """DF[seed, id, ppr] — settled mass after `rounds` synchronous
    pushes, positive rows only, round-6 (module docstring spec).

    Per-round (seed, id, p, r) state checkpoints durably with lineage
    (north-rule resume contract); a resumed run continues from the
    last saved round and is exactly equal to the uninterrupted run up
    to float-free integer round arithmetic (the state is a pure
    function of the round index)."""
    from graftlink.checkpoint import CheckpointManager

    spark = edges.sparkSession
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    e = cut(e, eager=True)
    deg = cut(deg, eager=True)

    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    mgr = CheckpointManager(
        checkpoint_dir, "ppr", spark,
        input_fingerprint=fingerprint, mode=checkpoint_mode, buckets=b,
    )
    start_round = 0
    state = None
    if resume:
        found = mgr.latest()
        if found is not None:
            start_round = found[0] + 1
            state = mgr.load(found[0], "id")
    if state is None:
        state = spark.createDataFrame(
            [(int(s), int(s), 0.0, 1.0) for s in seeds],
            "seed long, id long, p double, r double",
        )
    for rnd in range(start_round, rounds):
        pushing = state.join(deg.hint("shuffle_hash"), "id", "left").select(
            "seed", "id", "p", "r", F.coalesce("deg", F.lit(0)).alias("deg")
        )
        # name-based resolution: the saved state's plan CONTAINS e
        # (persist keeps lineage), so dataset-qualified e["src"] would
        # trip the ambiguous-self-join analyzer; (seed,id,p,r,deg) and
        # (src,dst) are name-disjoint, so plain names resolve uniquely
        nb_msgs = (
            pushing.where((F.col("r") > 0) & (F.col("deg") > 0))
            .join(e.hint("shuffle_hash"), F.col("id") == F.col("src"))
            .select(
                "seed",
                F.col("dst").alias("tgt"),
                F.col("id").alias("u"),
                ((1.0 - alpha) * F.col("r") / F.col("deg")).alias("c"),
            )
        )
        dangling = (
            pushing.where((F.col("r") > 0) & (F.col("deg") == 0))
            .select(
                "seed",
                F.col("seed").alias("tgt"),
                F.lit(-1).cast("long").alias("u"),
                ((1.0 - alpha) * F.col("r")).alias("c"),
            )
        )
        msgs = nb_msgs.unionByName(dangling)
        if ordered:
            rnew = msgs.groupBy("seed", "tgt").agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("u", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("rn")
            )
        else:  # production path: partial-agg combine, unordered fp
            rnew = msgs.groupBy("seed", "tgt").agg(F.sum("c").alias("rn"))
        settled = state.select(
            "seed", "id", (F.col("p") + alpha * F.col("r")).alias("p")
        )
        nxt = settled.join(
            rnew.select("seed", F.col("tgt").alias("id"), "rn").hint(
                "shuffle_hash"
            ),
            ["seed", "id"],
            "full_outer",
        ).select(
            "seed",
            "id",
            F.coalesce("p", F.lit(0.0)).alias("p"),
            F.coalesce("rn", F.lit(0.0)).alias("r"),
        )
        state = mgr.save(nxt, rnd, "id", counters={"round": rnd})
    return mgr.finalize(
        state.where(F.col("p") > 0)
        .select("seed", "id", F.round("p", 6).alias("ppr"))
        .where(F.col("ppr") > 0)
    )


def ppr_push_sql(
    clean: str,
    seeds: list[int],
    alpha: float = PPR_ALPHA,
    rounds: int = PPR_ROUNDS,
) -> str:
    """DuckDB twin — unrolled layers, identical fold order.

    The residual fold orders by (u, c) — not u alone: all dangling
    contributions share the sentinel u=-1, so with >= 3 dangling
    vertices in one seed's ball a u-only ORDER BY leaves their
    relative fold order unspecified and the double sum can differ by
    1 ulp from Spark's struct(u, c) sort (round-4 advisor finding).

    Every float literal is CAST to DOUBLE explicitly: DuckDB types
    bare `0.85`/`1.0` as DECIMAL, and decimal-contaminated arithmetic
    silently rounds the whole residual column (caught as a 1-ulp
    round-boundary mismatch at 6dp)."""
    seed_rows = ", ".join(
        f"(CAST({s} AS BIGINT), CAST({s} AS BIGINT), CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE))" for s in seeds
    )
    layers = []
    prev = "l0"
    for t in range(1, rounds + 1):
        cur = f"l{t}"
        layers.append(
            f"""p{t} AS MATERIALIZED (
            SELECT s.seed, s.id, s.p, s.r, coalesce(d.deg, 0) AS deg
            FROM {prev} s LEFT JOIN deg d ON d.id = s.id
        ),
        m{t} AS MATERIALIZED (
            SELECT seed, tgt, sum(c ORDER BY u, c) AS rn FROM (
                SELECT p.seed, e.dst AS tgt, p.id AS u,
                       (CAST(1.0 AS DOUBLE) - CAST({alpha} AS DOUBLE)) * p.r / p.deg AS c
                FROM p{t} p JOIN clean e ON e.src = p.id
                WHERE p.r > 0 AND p.deg > 0
                UNION ALL
                SELECT seed, seed AS tgt, CAST(-1 AS BIGINT) AS u,
                       (CAST(1.0 AS DOUBLE) - CAST({alpha} AS DOUBLE)) * r AS c
                FROM p{t} WHERE r > 0 AND deg = 0
            ) GROUP BY seed, tgt
        ),
        {cur} AS MATERIALIZED (
            SELECT coalesce(s.seed, m.seed) AS seed,
                   coalesce(s.id, m.tgt) AS id,
                   coalesce(s.p + CAST({alpha} AS DOUBLE) * s.r, CAST(0.0 AS DOUBLE)) AS p,
                   coalesce(m.rn, CAST(0.0 AS DOUBLE)) AS r
            FROM (SELECT seed, id, p, r FROM p{t}) s
            FULL OUTER JOIN m{t} m ON m.seed = s.seed AND m.tgt = s.id
        )"""
        )
        prev = cur
    layer_sql = ",\n        ".join(layers)
    return f"""
        WITH
        clean AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM ({clean}) WHERE src <> dst
        ),
        deg AS MATERIALIZED (
            SELECT src AS id, count(*) AS deg FROM clean GROUP BY src
        ),
        l0 AS (SELECT * FROM (VALUES {seed_rows}) AS t(seed, id, p, r)),
        {layer_sql}
        SELECT seed, id, round(p, 6) AS ppr
        FROM {prev}
        WHERE p > 0 AND round(p, 6) > 0
    """
