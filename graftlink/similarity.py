"""Similarity search over embedding columns (array<float>).

Three surfaces:

- `cosine_topk`        — exact brute-force top-k, pure JVM column
                         expressions. The dot/norm folds are written
                         as *sequential left folds* (F.aggregate) so
                         the DuckDB twin (list_reduce, same order)
                         produces bit-identical doubles — this is the
                         oracle-checked baseline.
- `cosine_topk_arrow`  — the 100 TB path: broadcast the query matrix,
                         numpy matmul per Arrow batch (mapInArrow),
                         per-partition top-k then a tiny global top-k
                         shuffle of |Q|*k*partitions rows. pytest
                         asserts allclose(1e-6) vs `cosine_topk`.
- `ann_lsh_topk`       — approximate NN via random-hyperplane LSH
                         (Charikar 2002): 8 deterministic integer
                         hyperplanes -> 8-bit bucket; candidates =
                         same-bucket rows; exact cosine re-rank within
                         bucket. Deterministic (hyperplanes derived
                         from an LCG formula, identical in the SQL
                         twin); recall vs brute force is a pytest
                         gate, not a guarantee.

`embedding_near_dups` (cosine >= threshold pairs) is EXACT either
way: method="tiled" (default) distributes the quadratic work as
bounded-memory block-pair matmuls (the 100 TB layout of an exact
similarity self-join); method="allpairs" is the column-expression
cross join kept as the semantic spec the DuckDB oracle mirrors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ANN_PLANES = 8
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2001


def _plane_coef(j: int, d: int) -> int:
    """Deterministic pseudo-random hyperplane coefficient in [-1000, 1000]."""
    return (_LCG_A * (j * 64 + d + 1) + _LCG_C) % _LCG_M - 1000


def _as_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _fold_sum(arr) -> F.Column:
    """Sequential left-fold sum — order-stable across engines."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def _dot(a, b) -> F.Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def embedding_norms(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """DF[id, dim, norm] — narrow map, no shuffle."""
    v = _as_double(F.col(vec_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(vec_col).cast("long").alias("dim"),
        F.round(F.sqrt(_fold_sum(F.transform(v, lambda x: x * x))), 6).alias("norm"),
    )


def cosine_topk(
    df: DataFrame, query_ids: list[int], k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """DF[query_id, neighbor_id, cos] — exact brute force.

    Plan: broadcast the |Q| query rows against the corpus (one narrow
    pass, no corpus shuffle), rank per query. Self-matches excluded.
    """
    base = with_norm(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "_v", "_norm"
    )
    q = with_norm(
        df.where(F.col(id_col).isin(query_ids)), vec_col
    ).select(F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"), F.col("_norm").alias("_qnorm"))
    cos = F.when(
        (F.col("_norm") > 0) & (F.col("_qnorm") > 0),
        _dot(F.col("_qv"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm")),
    ).otherwise(F.lit(0.0))
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def cosine_topk_arrow(
    df: DataFrame, query_ids: list[int], k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """numpy-matmul fast path; same contract as cosine_topk.

    The query matrix is collected to the driver (|Q| small by
    contract) and closed over into the kernel — on a cluster it ships
    once per executor via task broadcast. Each Arrow batch does one
    (batch x dim) @ (dim x |Q|) matmul; per-partition rows out are
    <= |Q| * batch_count * k, then one global window prunes to k.
    """
    qrows = (
        df.where(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column("_id").to_numpy(zero_copy_only=False)
            # zero-copy Arrow list -> numpy matrix: flatten the child
            # values buffer and reshape (fixed dim per contract) — the
            # round-1 to_pylist() here was the one Python-side
            # materialization in an otherwise columnar kernel
            embcol = b.column("_emb")
            flat = embcol.flatten().to_numpy(zero_copy_only=False)
            emb = np.asarray(flat, dtype=np.float64).reshape(b.num_rows, -1)
            norms = np.linalg.norm(emb, axis=1)
            norms[norms == 0] = 1.0
            # round BEFORE pruning: the global tie-break orders by the
            # ROUNDED cos, so batch-local pruning must keep every row
            # tied with the boundary value or results would depend on
            # partitioning (advisor finding r1)
            cos = np.round((emb @ qmat.T) / norms[:, None] / qnorm[None, :], 6)
            n_keep = min(k + 1, len(ids))
            out_q, out_n, out_c = [], [], []
            for qi in range(len(qids)):
                col = cos[:, qi]
                if len(col) > n_keep:
                    thresh = np.partition(-col, n_keep - 1)[n_keep - 1]
                    idx = np.nonzero(col >= -thresh)[0]
                else:
                    idx = np.arange(len(col))
                for i in idx:
                    if ids[i] != qids[qi]:
                        out_q.append(qids[qi]); out_n.append(ids[i]); out_c.append(col[i])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q, pa.int64()), pa.array(out_n, pa.int64()),
                 pa.array(np.array(out_c, dtype=np.float64), pa.float64())],
                ["query_id", "neighbor_id", "cos"],
            )

    prelim = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_emb")
    ).mapInArrow(kernel, "query_id long, neighbor_id long, cos double")
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        prelim.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def _bucket_expr(vec_col: str, dim: int, planes: int = ANN_PLANES) -> F.Column:
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for j in range(planes):
        hp = F.array(*[F.lit(float(_plane_coef(j, d))) for d in range(dim)])
        bucket = bucket + F.when(_dot(v, hp) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def ann_buckets(df: DataFrame, dim: int, id_col: str = "vec_id",
                vec_col: str = "embedding", planes: int = ANN_PLANES) -> DataFrame:
    """DF[id, bucket] — the LSH partitioner (narrow map)."""
    return df.select(
        F.col(id_col).alias("id"), _bucket_expr(vec_col, dim, planes).alias("bucket")
    )


def ann_lsh_topk(
    df: DataFrame, query_ids: list[int], k: int = 5, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding", planes: int = ANN_PLANES,
) -> DataFrame:
    """DF[query_id, neighbor_id, cos] — same-bucket candidates, exact
    re-rank. At scale the bucket equi-join replaces the brute-force
    cross join: cost sum(|bucket_q| ) instead of |Q| x n."""
    b = with_norm(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "_v", "_norm",
        _bucket_expr(vec_col, dim, planes).alias("bucket"),
    )
    q = with_norm(df.where(F.col(id_col).isin(query_ids)), vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"),
        _bucket_expr(vec_col, dim, planes).alias("bucket"),
    )
    cos = F.when(
        (F.col("_norm") > 0) & (F.col("_qnorm") > 0),
        _dot(F.col("_qv"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm")),
    ).otherwise(F.lit(0.0))
    scored = (
        b.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def _near_dup_tile_kernel(threshold: float):
    """applyInPandas kernel for one block pair: vectorized matmul of
    the two blocks' matrices, emit (a<b, cos) above threshold."""
    import pandas as pd

    def _mat(sub):
        ids = sub["_id"].to_numpy(dtype=np.int64)
        if len(ids) == 0:
            return ids, np.zeros((0, 0))
        m = np.asarray(np.stack(sub["_v"].to_numpy()), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = np.inf  # zero vectors -> cos 0 (matches the expr twin)
        return ids, m / n[:, None]

    def kernel(key, pdf):
        gi, gj = int(key[0]), int(key[1])
        if gi == gj:
            ids, m = _mat(pdf)
            c = np.round(m @ m.T, 6)
            iu, ju = np.triu_indices(len(ids), k=1)
            keep = c[iu, ju] >= threshold
            a, b, cs = ids[iu[keep]], ids[ju[keep]], c[iu, ju][keep]
        else:
            ids_l, ml = _mat(pdf[pdf["_g"] == gi])
            ids_r, mr = _mat(pdf[pdf["_g"] == gj])
            if len(ids_l) == 0 or len(ids_r) == 0:
                return pd.DataFrame({"a": [], "b": [], "cos": []})
            c = np.round(ml @ mr.T, 6)
            ii, jj = np.nonzero(c >= threshold)
            a0, b0 = ids_l[ii], ids_r[jj]
            a, b = np.minimum(a0, b0), np.maximum(a0, b0)
            cs = c[ii, jj]
        return pd.DataFrame(
            {"a": a.astype(np.int64), "b": b.astype(np.int64),
             "cos": cs.astype(np.float64)}
        )

    return kernel


def embedding_near_dups(
    df: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    method: str = "tiled", block_rows: int = 4096,
) -> DataFrame:
    """DF[a, b, cos] — all pairs with cosine >= threshold (EXACT in
    both methods; pytest asserts set equality between them).

    method="tiled" (default, the scale path): partition the corpus
    into B = ceil(n/block_rows) blocks, replicate each row to its B
    block-pairs, and compute one normalized matmul per pair inside
    applyInPandas. Work is the same O(n^2) dot products an exact
    answer requires, but laid out as n*B shuffled rows and B(B+1)/2
    bounded-memory tiles across executors — no per-row crossJoin
    blow-up, no single-task all-pairs. (For approximate near-dup at
    much lower cost, use ann_buckets + verify.)

    method="allpairs": the pure column-expression cross join — the
    semantic spec the DuckDB oracle mirrors fold-for-fold; quadratic
    rows, test-scale only.
    """
    if method == "allpairs":
        base = with_norm(df, vec_col)
        l = base.select(F.col(id_col).alias("a"), F.col("_v").alias("_va"), F.col("_norm").alias("_na"))
        r = base.select(F.col(id_col).alias("b"), F.col("_v").alias("_vb"), F.col("_norm").alias("_nb"))
        cos = F.when(
            (F.col("_na") > 0) & (F.col("_nb") > 0),
            _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
        ).otherwise(F.lit(0.0))
        return (
            l.crossJoin(r)
            .where(F.col("a") < F.col("b"))
            .select("a", "b", F.round(cos, 6).alias("cos"))
            .where(F.col("cos") >= threshold)
        )
    if method != "tiled":
        raise ValueError(f"unknown method: {method}")
    spark = df.sparkSession
    n = df.count()
    n_blocks = max(1, -(-n // block_rows))
    pair_rows = [
        (blk, gi, gj)
        for gi in range(n_blocks)
        for gj in range(gi, n_blocks)
        for blk in ({gi, gj})
    ]
    pair_map = spark.createDataFrame(pair_rows, "blk long, gi long, gj long")
    base = df.select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
        # block on a hash of the id, not the id itself: structured id
        # distributions (shared residue classes) would otherwise pile
        # most rows into a few blocks, defeating the bounded-memory
        # block_rows claim (round-2 advisor finding)
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_g"),
    )
    repl = base.join(F.broadcast(pair_map), base["_g"] == pair_map["blk"])
    return repl.groupBy("gi", "gj").applyInPandas(
        _near_dup_tile_kernel(threshold), "a long, b long, cos double"
    )


# ---------------------------------------------------------------------------
# DuckDB twins — same fold order, same literals
# ---------------------------------------------------------------------------

_D = "list_transform({col}, x -> CAST(x AS DOUBLE))"


def _fold_sum_sql(arr: str) -> str:
    return f"list_reduce(list_prepend(0.0, {arr}), (acc, v) -> acc + v)"


def _dot_sql(a: str, b: str) -> str:
    return _fold_sum_sql(f"list_transform(list_zip({a}, {b}), s -> s[1] * s[2])")


def embedding_norms_sql(table: str = "embeddings", id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    v = _D.format(col=vec_col)
    sq = _fold_sum_sql(f"list_transform({v}, x -> x * x)")
    return (
        f"SELECT {id_col} AS id, CAST(len({vec_col}) AS BIGINT) AS dim, "
        f"round(sqrt({sq}), 6) AS norm FROM {table}"
    )


def cosine_topk_sql(query_ids: list[int], k: int = 5, table: str = "embeddings",
                    id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    v = _D.format(col=vec_col)
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {v} AS v,
                   sqrt({_fold_sum_sql(f"list_transform({v}, x -> x * x)")}) AS nrm
            FROM {table}
        ),
        q AS (SELECT id AS query_id, v AS qv, nrm AS qnrm FROM base WHERE id IN ({ids})),
        scored AS (
            SELECT q.query_id, b.id AS neighbor_id,
                   round(CASE WHEN b.nrm > 0 AND q.qnrm > 0
                         THEN {_dot_sql('q.qv', 'b.v')} / (q.qnrm * b.nrm)
                         ELSE 0.0 END, 6) AS cos
            FROM base b CROSS JOIN q WHERE b.id != q.query_id
        )
        SELECT query_id, neighbor_id, cos FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= {k}
    """


def _bucket_sql(v: str, dim: int, planes: int = ANN_PLANES) -> str:
    terms = []
    for j in range(planes):
        coefs = "[" + ", ".join(f"{float(_plane_coef(j, d))}" for d in range(dim)) + "]"
        terms.append(
            f"(CASE WHEN {_dot_sql(v, coefs)} > 0 THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def ann_lsh_topk_sql(query_ids: list[int], k: int = 5, dim: int = 64,
                     table: str = "embeddings", id_col: str = "vec_id",
                     vec_col: str = "embedding", planes: int = ANN_PLANES) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    v = _D.format(col=vec_col)
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {v} AS v,
                   sqrt({_fold_sum_sql(f"list_transform({v}, x -> x * x)")}) AS nrm,
                   {_bucket_sql('v_inner', dim, planes)} AS bucket
            FROM (SELECT *, {v} AS v_inner FROM {table})
        ),
        q AS (SELECT id AS query_id, v AS qv, nrm AS qnrm, bucket FROM base
              WHERE id IN ({ids})),
        scored AS (
            SELECT q.query_id, b.id AS neighbor_id,
                   round(CASE WHEN b.nrm > 0 AND q.qnrm > 0
                         THEN {_dot_sql('q.qv', 'b.v')} / (q.qnrm * b.nrm)
                         ELSE 0.0 END, 6) AS cos
            FROM base b JOIN q ON b.bucket = q.bucket
            WHERE b.id != q.query_id
        )
        SELECT query_id, neighbor_id, cos FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= {k}
    """


def embedding_near_dups_sql(threshold: float = 0.95, table: str = "embeddings",
                            id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    v = _D.format(col=vec_col)
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {v} AS v,
                   sqrt({_fold_sum_sql(f"list_transform({v}, x -> x * x)")}) AS nrm
            FROM {table}
        )
        SELECT l.id AS a, r.id AS b,
               round(CASE WHEN l.nrm > 0 AND r.nrm > 0
                     THEN {_dot_sql('l.v', 'r.v')} / (l.nrm * r.nrm)
                     ELSE 0.0 END, 6) AS cos
        FROM base l JOIN base r ON l.id < r.id
        WHERE round(CASE WHEN l.nrm > 0 AND r.nrm > 0
                    THEN {_dot_sql('l.v', 'r.v')} / (l.nrm * r.nrm)
                    ELSE 0.0 END, 6) >= {threshold}
    """
