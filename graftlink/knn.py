"""k-nearest-neighbor GRAPH construction over an embedding column —
the bridge between the §2C similarity layer and the graph engine:
the output DF[src, dst, cos] is a weighted edge table every graph
operator in this engine accepts directly (communities over a kNN
graph of document embeddings is the standard semantic-dedup /
topic-clustering recipe, e.g. SemDeDup).

No igraph anchor (igraph consumes graphs, it doesn't build them from
vectors); the semantics are the classic exact-kNN contract: for every
vertex, the k neighbors with highest cosine (ties broken by ascending
neighbor id on the 6-decimal-rounded cosine — the same deterministic
contract as cosine_topk).

method="tiled" (default, the 100 TB layout): the embedding_near_dups
block scheme — hash rows into B = ceil(n/block_rows) blocks, one
bounded-memory normalized matmul per block pair — with one addition:
each tile emits only its TILE-LOCAL top-k per source row, so the
downstream state is n*B*k candidate rows instead of the n^2 score
matrix (global top-k over a set is the top-k over the union of each
subset's top-k, so the prune is lossless). The final per-source merge
is the engine's bounded collect+sort_array slice — no Window over the
corpus. Exact kNN is inherently Theta(n^2) COMPUTE; the point is that
nothing n^2-sized ever hits a shuffle or a single task. For sublinear
candidate generation swap in ann_buckets (similarity.py) upstream.

method="allpairs": the pure column-expression cross join — the
semantic spec the DuckDB oracle mirrors fold-for-fold; quadratic
rows, test-scale only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.similarity import _as_double, _dot, with_norm


def _knn_tile_kernel(k: int):
    """applyInPandas kernel for one block pair: normalized matmul,
    then tile-local top-k per source row (both orientations on
    off-diagonal tiles), ties broken (cos desc, dst asc) on the
    ROUNDED cosine — the same order the final slice and the DuckDB
    twin use, so the prune can never disagree with the contract."""
    import pandas as pd

    def _mat(sub):
        ids = sub["_id"].to_numpy(dtype=np.int64)
        if len(ids) == 0:
            return ids, np.zeros((0, 0))
        m = np.asarray(np.stack(sub["_v"].to_numpy()), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = np.inf  # zero vectors -> cos 0 (matches the expr twin)
        return ids, m / n[:, None]

    def _topk_rows(src_ids, dst_ids, c, exclude_diag):
        outs, outd, outc = [], [], []
        for i in range(c.shape[0]):
            row = c[i]
            mask = np.ones(c.shape[1], dtype=bool)
            if exclude_diag:
                mask[i] = False
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            order = np.lexsort((dst_ids[cand], -row[cand]))[:k]
            sel = cand[order]
            outs.append(np.full(len(sel), src_ids[i], dtype=np.int64))
            outd.append(dst_ids[sel])
            outc.append(row[sel])
        if not outs:
            return (np.zeros(0, np.int64),) * 2 + (np.zeros(0, np.float64),)
        return np.concatenate(outs), np.concatenate(outd), np.concatenate(outc)

    def kernel(key, pdf):
        gi, gj = int(key[0]), int(key[1])
        if gi == gj:
            ids, m = _mat(pdf)
            if len(ids) == 0:
                return pd.DataFrame({"src": [], "dst": [], "cos": []})
            c = np.round(m @ m.T, 6)
            s, d, cs = _topk_rows(ids, ids, c, exclude_diag=True)
        else:
            ids_l, ml = _mat(pdf[pdf["_g"] == gi])
            ids_r, mr = _mat(pdf[pdf["_g"] == gj])
            if len(ids_l) == 0 or len(ids_r) == 0:
                return pd.DataFrame({"src": [], "dst": [], "cos": []})
            c = np.round(ml @ mr.T, 6)
            s1, d1, c1 = _topk_rows(ids_l, ids_r, c, exclude_diag=False)
            s2, d2, c2 = _topk_rows(ids_r, ids_l, c.T, exclude_diag=False)
            s, d, cs = (
                np.concatenate([s1, s2]),
                np.concatenate([d1, d2]),
                np.concatenate([c1, c2]),
            )
        return pd.DataFrame(
            {"src": s.astype(np.int64), "dst": d.astype(np.int64),
             "cos": cs.astype(np.float64)}
        )

    return kernel


def knn_graph(
    df: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    method: str = "tiled", block_rows: int = 4096,
) -> DataFrame:
    """DF[src, dst, cos] — for every row, its k highest-cosine
    neighbors (fewer iff n-1 < k). Exact in both methods; pytest
    asserts set equality between them."""
    if method == "allpairs":
        base = with_norm(df, vec_col)
        l = base.select(
            F.col(id_col).alias("src"), F.col("_v").alias("_va"),
            F.col("_norm").alias("_na"),
        )
        r = base.select(
            F.col(id_col).alias("dst"), F.col("_v").alias("_vb"),
            F.col("_norm").alias("_nb"),
        )
        cos = F.when(
            (F.col("_na") > 0) & (F.col("_nb") > 0),
            _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
        ).otherwise(F.lit(0.0))
        cands = (
            l.crossJoin(r)
            .where(F.col("src") != F.col("dst"))
            .select("src", "dst", F.round(cos, 6).alias("cos"))
        )
        return _slice_topk(cands, k)
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
        # hash-blocked, not id-blocked (round-2 advisor finding — see
        # embedding_near_dups)
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_g"),
    )
    repl = base.join(F.broadcast(pair_map), base["_g"] == pair_map["blk"])
    cands = repl.groupBy("gi", "gj").applyInPandas(
        _knn_tile_kernel(k), "src long, dst long, cos double"
    )
    return _slice_topk(cands, k)


def _slice_topk(cands: DataFrame, k: int) -> DataFrame:
    """Per-src global top-k over the bounded candidate set (<= B*k per
    src): collect + sort_array + slice — no Window over the corpus.
    Sort key struct(-cos, dst) = (cos desc, dst asc) on the rounded
    cosine, identical to the twin's row_number order."""
    sorted_k = F.slice(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("cos")).alias("_nc"),
                    F.col("dst").alias("dst"),
                    F.col("cos").alias("cos"),
                )
            )
        ),
        1,
        k,
    )
    return (
        cands.groupBy("src")
        .agg(sorted_k.alias("_top"))
        .select("src", F.explode("_top").alias("_e"))
        .select("src", F.col("_e.dst").alias("dst"), F.col("_e.cos").alias("cos"))
    )


# ---------------------------------------------------------------------------
# DuckDB twin — same folds, same rounding, same tie order
# ---------------------------------------------------------------------------


def knn_graph_sql(k: int = 5, table: str = "embeddings",
                  id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    from graftlink.similarity import _D, _dot_sql, _fold_sum_sql

    v = _D.format(col=vec_col)
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {v} AS v,
                   sqrt({_fold_sum_sql(f"list_transform({v}, x -> x * x)")}) AS nrm
            FROM {table}
        ),
        scored AS (
            SELECT l.id AS src, r.id AS dst,
                   round(CASE WHEN l.nrm > 0 AND r.nrm > 0
                         THEN {_dot_sql('l.v', 'r.v')} / (l.nrm * r.nrm)
                         ELSE 0.0 END, 6) AS cos
            FROM base l CROSS JOIN base r WHERE l.id != r.id
        )
        SELECT src, dst, cos FROM (
            SELECT *, row_number() OVER (
                PARTITION BY src ORDER BY cos DESC, dst ASC) AS rn
            FROM scored
        ) WHERE rn <= {k}
    """
