"""Deterministic degree-preserving rewiring (igraph `rewire`, the
configuration-model null-model generator) — seeded, reproducible,
cross-engine replayable.

igraph's rewire performs random double-edge swaps; RNG-defined output
is why the round-3 ledger declared it absent. This variant replaces
the RNG with the engine's portable mod-P poly-hash (the seeded-walks
recipe, graftlink/walks.py): each round

1. hashes every edge h = H(src, dst, round, seed) and buckets edges
   into ~m/2 hash buckets,
2. inside each bucket elects the (h, src, dst)-min and -max edges as
   a swap pair (one groupBy with min/max struct aggregates — no
   Window, no per-bucket enumeration),
3. proposes the directed double-edge swap (s1,d1)+(s2,d2) ->
   (s1,d2)+(s2,d1), and applies it ONLY if the bucket stays atomic:
   no self-loop, neither new edge collides with a surviving existing
   edge, and no two buckets propose the same new edge (one groupBy
   over proposals + two anti-joins).

Each applied swap preserves every vertex's in-degree AND out-degree
exactly and keeps the graph simple; rejected buckets keep their
edges, so the operator is total. The DuckDB twin replays the SAME
arithmetic round by round (rounds are unrolled, Boruvka-twin style),
so the output is hash-checkable — the determinism contract igraph's
RNG cannot offer.

Scale shape: per round two hash-partitioned groupBys (bucket election,
proposal-collision count) + three joins keyed on (src,dst) — all
map-side combinable, nothing closure-shaped, hub skew irrelevant
because buckets are hash-uniform over EDGES, not vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 1_000_000_007
A1, A2, A3, A4, C = 2_654_435_761 % P, 40_503, 69_069, 1_103_515_245, 12_345


def _h(src, dst, rnd: int, seed: int):
    return (
        (src % P) * A3 + (dst % P) * A4 + (rnd % P) * A2 + (seed % P) * A1 + C
    ) % P


def rewire_edges(
    edges: DataFrame,
    rounds: int = 3,
    seed: int = 42,
    buckets: int | None = None,
) -> DataFrame:
    """edges DF[src,dst] (directed, simplified internally) ->
    DF[src,dst]: a degree-preserving rewiring after `rounds`
    deterministic swap sweeps. In/out degree sequences and edge count
    are preserved exactly; the result is simple (no loops, no
    parallel edges)."""
    spark = edges.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cur = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(b, "src", "dst")
        .localCheckpoint(eager=True)
    )
    m = cur.count()
    nb = max(1, m // 2)
    for rnd in range(rounds):
        h = cur.select(
            "src", "dst", _h(F.col("src"), F.col("dst"), rnd, seed).alias("h")
        ).withColumn("bkt", F.col("h") % F.lit(nb))
        pairs = (
            h.groupBy("bkt")
            .agg(
                F.min(F.struct("h", "src", "dst")).alias("e1"),
                F.max(F.struct("h", "src", "dst")).alias("e2"),
                F.count("*").alias("n"),
            )
            .where(F.col("n") >= 2)
            .select(
                "bkt",
                F.col("e1.src").alias("s1"),
                F.col("e1.dst").alias("d1"),
                F.col("e2.src").alias("s2"),
                F.col("e2.dst").alias("d2"),
            )
            # the proposed swap: (s1,d2) and (s2,d1); drop self-loops
            # and degenerate proposals (same new edge twice)
            .where(
                (F.col("s1") != F.col("d2"))
                & (F.col("s2") != F.col("d1"))
                & ~((F.col("s1") == F.col("s2")) & (F.col("d2") == F.col("d1")))
            )
        )
        new_edges = pairs.select(
            "bkt", F.col("s1").alias("src"), F.col("d2").alias("dst")
        ).unionByName(
            pairs.select("bkt", F.col("s2").alias("src"), F.col("d1").alias("dst"))
        )
        old_edges = pairs.select(
            "bkt", F.col("s1").alias("src"), F.col("d1").alias("dst")
        ).unionByName(
            pairs.select("bkt", F.col("s2").alias("src"), F.col("d2").alias("dst"))
        )
        # bucket fails if (a) a proposed new edge collides with another
        # proposal, or (b) it collides with any CURRENT edge other than
        # the bucket's OWN two removed edges — conservative on purpose:
        # a failed bucket keeps its edges, so colliding with another
        # bucket's to-be-removed edge cannot be assumed safe (that
        # bucket may itself fail and keep the edge)
        dup_fail = (
            new_edges.groupBy("src", "dst")
            .agg(F.count("*").alias("c"), F.collect_set("bkt").alias("bks"))
            .where(F.col("c") >= 2)
            .select(F.explode("bks").alias("bkt"))
        )
        exist_fail = (
            new_edges.join(cur, ["src", "dst"], "left_semi")
            .join(old_edges, ["bkt", "src", "dst"], "left_anti")
            .select("bkt")
        )
        failed = dup_fail.unionByName(exist_fail).distinct()
        ok = pairs.join(failed, "bkt", "left_anti")
        drop = ok.select(
            F.col("s1").alias("src"), F.col("d1").alias("dst")
        ).unionByName(ok.select(F.col("s2").alias("src"), F.col("d2").alias("dst")))
        add = ok.select(
            F.col("s1").alias("src"), F.col("d2").alias("dst")
        ).unionByName(ok.select(F.col("s2").alias("src"), F.col("d1").alias("dst")))
        cur = (
            cur.join(drop, ["src", "dst"], "left_anti")
            .unionByName(add)
            .repartition(b, "src", "dst")
            .localCheckpoint(eager=True)
        )
    return cur


def rewire_sql(clean: str, rounds: int = 3, seed: int = 42) -> str:
    """DuckDB twin: unrolled round-by-round replay of the identical
    hash arithmetic and swap acceptance rules (min/max election via
    row_number — the oracle may use windows; the Spark side may not).

    Every CTE is MATERIALIZED: without the hint DuckDB inlines CTEs,
    and each round references its predecessor several times, so the
    chain re-evaluates exponentially in `rounds`. Acceptance checks
    are SEMI/ANTI joins, not correlated EXISTS, for the same reason."""
    blocks = [
        f"""
        r0 AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM ({clean}) WHERE src <> dst
        ),
        nbv AS MATERIALIZED (SELECT greatest(count(*) // 2, 1) AS nb FROM r0)"""
    ]
    for i in range(rounds):
        prev = f"r{i}"
        nxt = f"r{i + 1}"
        # fold the round/seed terms into one Python-side constant so
        # no INT32 literal product can overflow in the SQL engine
        k = ((i % P) * A2 + (seed % P) * A1 + C) % P
        blocks.append(f"""
        {nxt}_h AS MATERIALIZED (
            SELECT src, dst, h, h % (SELECT nb FROM nbv) AS bkt FROM (
                SELECT src, dst,
                       ((CAST(src AS BIGINT) % {P}) * {A3}
                        + (CAST(dst AS BIGINT) % {P}) * {A4}
                        + {k}) % {P} AS h
                FROM {prev}
            )
        ),
        {nxt}_rk AS MATERIALIZED (
            SELECT *,
                   row_number() OVER (PARTITION BY bkt ORDER BY h, src, dst) AS ra,
                   row_number() OVER (PARTITION BY bkt ORDER BY h DESC, src DESC, dst DESC) AS rd,
                   count(*) OVER (PARTITION BY bkt) AS n
            FROM {nxt}_h
        ),
        {nxt}_pairs AS MATERIALIZED (
            SELECT lo.bkt,
                   lo.src AS s1, lo.dst AS d1,
                   hi.src AS s2, hi.dst AS d2
            FROM (SELECT * FROM {nxt}_rk WHERE ra = 1 AND n >= 2) lo
            JOIN (SELECT * FROM {nxt}_rk WHERE rd = 1) hi USING (bkt)
            WHERE lo.src <> hi.dst AND hi.src <> lo.dst
              AND NOT (lo.src = hi.src AND hi.dst = lo.dst)
        ),
        {nxt}_new AS MATERIALIZED (
            SELECT bkt, s1 AS src, d2 AS dst FROM {nxt}_pairs
            UNION ALL
            SELECT bkt, s2, d1 FROM {nxt}_pairs
        ),
        {nxt}_old AS MATERIALIZED (
            SELECT bkt, s1 AS src, d1 AS dst FROM {nxt}_pairs
            UNION ALL
            SELECT bkt, s2, d2 FROM {nxt}_pairs
        ),
        {nxt}_dup AS MATERIALIZED (
            SELECT src, dst FROM {nxt}_new GROUP BY src, dst HAVING count(*) >= 2
        ),
        {nxt}_exfail AS MATERIALIZED (
            SELECT DISTINCT n.bkt FROM (
                SELECT n0.bkt, n0.src, n0.dst FROM {nxt}_new n0
                SEMI JOIN {prev} c ON c.src = n0.src AND c.dst = n0.dst
            ) n
            ANTI JOIN {nxt}_old o
              ON o.bkt = n.bkt AND o.src = n.src AND o.dst = n.dst
        ),
        {nxt}_fail AS MATERIALIZED (
            SELECT DISTINCT n.bkt FROM {nxt}_new n
            JOIN {nxt}_dup d ON d.src = n.src AND d.dst = n.dst
            UNION
            SELECT bkt FROM {nxt}_exfail
        ),
        {nxt}_ok AS MATERIALIZED (
            SELECT * FROM {nxt}_pairs
            ANTI JOIN {nxt}_fail f ON f.bkt = {nxt}_pairs.bkt
        ),
        {nxt}_drop AS MATERIALIZED (
            SELECT s1 AS src, d1 AS dst FROM {nxt}_ok
            UNION ALL
            SELECT s2, d2 FROM {nxt}_ok
        ),
        {nxt} AS MATERIALIZED (
            SELECT c.src, c.dst FROM {prev} c
            ANTI JOIN {nxt}_drop d ON d.src = c.src AND d.dst = c.dst
            UNION ALL
            SELECT s1, d2 FROM {nxt}_ok
            UNION ALL
            SELECT s2, d1 FROM {nxt}_ok
        )""")
    return (
        "WITH " + ",".join(blocks) + f"\n        SELECT src, dst FROM r{rounds}"
    )
