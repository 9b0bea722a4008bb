"""Partition-comparison metrics (igraph `compare_communities`).

Given two labelings of the same vertex set, compute in ONE pass over
the contingency table the five deterministic methods igraph exposes
(`igraph_compare_communities` methods "vi", "nmi", "rand",
"adjusted_rand", "split-join" — public anchor igraph@0.10.x
`src/community/community_misc.c`; the sixth, per-method split
variants, are linear combinations of the same sums):

- vi            Meila's variation of information, nats
- nmi           Danon et al. 2005: 2*I(X;Y) / (H(X)+H(Y))
- rand          Rand index
- adjusted_rand Hubert-Arabie ARI
- split_join    van Dongen split-join distance (integer)

Scale shape: the ONLY per-vertex work is one equi-join on id plus one
map-side-combining groupBy(la, lb).  Everything downstream operates on
the contingency table (|cells| <= |labels_a| * |labels_b|, in practice
O(#communities)), so at 10^12 vertices the heavy exchange is the
id-join; cells/marginals are tiny relational follow-ups.  No Window,
no Python UDFs, no collect until the final 1-row agg.

Numeric discipline (cross-engine hash contract):
- every pair count C(x,2) is summed as the EXACT bigint sum(x*(x-1))
  then halved (each term is even, so the sum is even and integer
  division is exact) — no doubles until the final ratios (the
  triads.py 2^53 lesson, ADVICE r3);
- the three entropy-like folds (I, H(X), H(Y)) add their cell terms in
  ascending (la, lb) / la / lb order via
  aggregate(sort_array(collect_list(...))), bit-identical to the
  DuckDB twin's `sum(... ORDER BY ...)`;
- final floats rounded to 6 decimals in BOTH engines (%.6g driver
  hash).

Edge cases match igraph: identical single-cluster partitions give
nmi=1, vi=0, rand=1, ari=1, split_join=0; ARI's degenerate
denominator (both partitions all-singletons or both one-cluster)
returns 1.0 when the numerator is also 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _ordered_fold(key_cols: list[str], term_col: str) -> F.Column:
    """Sum `term_col` over the group in ascending `key_cols` order —
    the deterministic-association-order double sum (same sequence as
    the twin's `sum(term ORDER BY key)`)."""
    return F.aggregate(
        F.sort_array(F.collect_list(F.struct(*key_cols, term_col))),
        F.lit(0.0),
        lambda acc, x: acc + x[term_col],
    )


def compare_communities(
    comm_a: DataFrame,
    comm_b: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """DF 1 row: [n, cells, vi, nmi, rand, adjusted_rand, split_join].

    `comm_a` / `comm_b`: DF[id_col, label_col] over the same vertex
    set (vertices present in only one side are dropped by the inner
    join, matching igraph's requirement of equal-length membership
    vectors).
    """
    a = comm_a.select(F.col(id_col).alias("id"), F.col(label_col).alias("la"))
    b = comm_b.select(F.col(id_col).alias("id"), F.col(label_col).alias("lb"))
    # contingency table: the one per-vertex exchange
    ct = (
        a.join(b.hint("shuffle_hash"), "id")
        .groupBy("la", "lb")
        .agg(F.count("*").cast("long").alias("nij"))
    )
    ra = ct.groupBy("la").agg(F.sum("nij").alias("ai"))
    rb = ct.groupBy("lb").agg(F.sum("nij").alias("bj"))

    # per-cell joint terms; marginal joins stay on the (small) cells
    cells = (
        ct.join(ra.hint("shuffle_hash"), "la")
        .join(rb.hint("shuffle_hash"), "lb")
    )
    # MI needs n inside the log; to keep ONE pass we fold
    # nij*ln(nij/(ai*bj)) and add n*ln(n) afterwards:
    #   sum nij*ln(n*nij/(ai*bj)) = sum nij*ln(nij/(ai*bj)) + n*ln(n)
    cells = cells.withColumn(
        "mi_t",
        F.col("nij")
        * F.log(
            F.col("nij").cast("double")
            / (F.col("ai").cast("double") * F.col("bj").cast("double"))
        ),
    )
    joint = cells.agg(
        F.sum("nij").cast("long").alias("n"),
        F.count("*").cast("long").alias("cells"),
        (F.sum(F.col("nij") * (F.col("nij") - F.lit(1))).cast("long"))
        .alias("p2ij_x2"),
        _ordered_fold(["la", "lb"], "mi_t").alias("mi_part"),
    )

    ha = ra.withColumn(
        "h_t", F.col("ai").cast("double") * F.log(F.col("ai").cast("double"))
    ).agg(
        (F.sum(F.col("ai") * (F.col("ai") - F.lit(1))).cast("long"))
        .alias("p2a_x2"),
        _ordered_fold(["la"], "h_t").alias("hx_part"),
        F.sum(F.col("ai")).cast("long").alias("n_a"),
    )
    hb = rb.withColumn(
        "h_t", F.col("bj").cast("double") * F.log(F.col("bj").cast("double"))
    ).agg(
        (F.sum(F.col("bj") * (F.col("bj") - F.lit(1))).cast("long"))
        .alias("p2b_x2"),
        _ordered_fold(["lb"], "h_t").alias("hy_part"),
    )
    # split-join: 2n - sum_a max_b nij - sum_b max_a nij  (exact ints)
    mx_a = ct.groupBy("la").agg(F.max("nij").alias("m")).agg(
        F.sum("m").cast("long").alias("sum_max_a")
    )
    mx_b = ct.groupBy("lb").agg(F.max("nij").alias("m")).agg(
        F.sum("m").cast("long").alias("sum_max_b")
    )

    s = (
        joint.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .crossJoin(F.broadcast(mx_a))
        .crossJoin(F.broadcast(mx_b))
    )
    n = F.col("n").cast("double")
    ln_n = F.log(n)
    # raw-count (un-normalized, scale-invariant in the ratios) sums:
    #   I_raw  = sum nij ln(n nij/(ai bj)) = mi_part + n ln n
    #   Hx_raw = -sum ai ln(ai/n)          = n ln n - hx_part
    i_raw = F.col("mi_part") + n * ln_n
    hx_raw = n * ln_n - F.col("hx_part")
    hy_raw = n * ln_n - F.col("hy_part")
    sab = F.col("p2ij_x2") / F.lit(2.0)  # sum C(nij,2), exact halves
    sa = F.col("p2a_x2") / F.lit(2.0)
    sb = F.col("p2b_x2") / F.lit(2.0)
    cn2 = n * (n - 1.0) / 2.0
    exp_idx = sa * sb / cn2
    ari_den = (sa + sb) / 2.0 - exp_idx
    return s.select(
        F.col("n"),
        F.col("cells"),
        F.round((hx_raw + hy_raw - 2.0 * i_raw) / n, 6).alias("vi"),
        F.round(
            F.when(hx_raw + hy_raw == 0.0, F.lit(1.0)).otherwise(
                2.0 * i_raw / (hx_raw + hy_raw)
            ),
            6,
        ).alias("nmi"),
        F.round((cn2 + 2.0 * sab - sa - sb) / cn2, 6).alias("rand"),
        F.round(
            F.when(ari_den == 0.0, F.lit(1.0)).otherwise(
                (sab - exp_idx) / ari_den
            ),
            6,
        ).alias("adjusted_rand"),
        (
            F.lit(2) * F.col("n")
            - F.col("sum_max_a")
            - F.col("sum_max_b")
        ).cast("long").alias("split_join"),
    )


def compare_communities_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB twin: `a_sql` / `b_sql` each select (id, label).  Mirrors
    the exact-integer pair counts, the ordered entropy folds, and the
    6-decimal rounding."""
    return f"""
        WITH
        pa AS (SELECT id, label AS la FROM ({a_sql})),
        pb AS (SELECT id, label AS lb FROM ({b_sql})),
        ct AS (
            SELECT la, lb, CAST(count(*) AS BIGINT) AS nij
            FROM pa JOIN pb USING (id) GROUP BY la, lb
        ),
        ra AS (SELECT la, sum(nij) AS ai FROM ct GROUP BY la),
        rb AS (SELECT lb, sum(nij) AS bj FROM ct GROUP BY lb),
        joint AS (
            SELECT
                CAST(sum(nij) AS BIGINT) AS n,
                CAST(count(*) AS BIGINT) AS cells,
                CAST(sum(nij * (nij - 1)) AS BIGINT) AS p2ij_x2,
                sum(nij * ln(CAST(nij AS DOUBLE) / (ai * bj))
                    ORDER BY la, lb) AS mi_part
            FROM ct JOIN ra USING (la) JOIN rb USING (lb)
        ),
        ha AS (
            SELECT
                CAST(sum(ai * (ai - 1)) AS BIGINT) AS p2a_x2,
                sum(CAST(ai AS DOUBLE) * ln(CAST(ai AS DOUBLE))
                    ORDER BY la) AS hx_part
            FROM ra
        ),
        hb AS (
            SELECT
                CAST(sum(bj * (bj - 1)) AS BIGINT) AS p2b_x2,
                sum(CAST(bj AS DOUBLE) * ln(CAST(bj AS DOUBLE))
                    ORDER BY lb) AS hy_part
            FROM rb
        ),
        mxa AS (
            SELECT CAST(sum(m) AS BIGINT) AS sum_max_a
            FROM (SELECT la, max(nij) AS m FROM ct GROUP BY la)
        ),
        mxb AS (
            SELECT CAST(sum(m) AS BIGINT) AS sum_max_b
            FROM (SELECT lb, max(nij) AS m FROM ct GROUP BY lb)
        )
        SELECT
            n, cells,
            round(((CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) - hx_part)
                 + (CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) - hy_part)
                 - 2.0 * (mi_part + CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))))
                 / CAST(n AS DOUBLE), 6) AS vi,
            round(CASE
                WHEN (CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) - hx_part)
                   + (CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) - hy_part)
                   = 0.0
                THEN 1.0
                ELSE 2.0 * (mi_part + CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)))
                   / ((CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) - hx_part)
                    + (CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) - hy_part))
            END, 6) AS nmi,
            round((CAST(n AS DOUBLE) * (n - 1) / 2.0
                   + 2.0 * (p2ij_x2 / 2.0) - p2a_x2 / 2.0 - p2b_x2 / 2.0)
                  / (CAST(n AS DOUBLE) * (n - 1) / 2.0), 6) AS rand,
            round(CASE
                WHEN (p2a_x2 / 2.0 + p2b_x2 / 2.0) / 2.0
                   - (p2a_x2 / 2.0) * (p2b_x2 / 2.0)
                     / (CAST(n AS DOUBLE) * (n - 1) / 2.0) = 0.0
                THEN 1.0
                ELSE ((p2ij_x2 / 2.0)
                      - (p2a_x2 / 2.0) * (p2b_x2 / 2.0)
                        / (CAST(n AS DOUBLE) * (n - 1) / 2.0))
                   / ((p2a_x2 / 2.0 + p2b_x2 / 2.0) / 2.0
                      - (p2a_x2 / 2.0) * (p2b_x2 / 2.0)
                        / (CAST(n AS DOUBLE) * (n - 1) / 2.0))
            END, 6) AS adjusted_rand,
            CAST(2 * n - sum_max_a - sum_max_b AS BIGINT) AS split_join
        FROM joint, ha, hb, mxa, mxb
    """
