"""IVF approximate nearest neighbor: deterministic Lloyd k-means
coarse quantizer + cluster-probed exact cosine search.

The SemDeDup/FAISS-IVF recipe restated for the engine's determinism
discipline: a trained coarse quantizer partitions the corpus into k
cells; a query probes only the `nprobe` nearest cells and runs exact
cosine inside them — the standard scale path between brute force
(similarity.cosine_topk) and hash bucketing (similarity.ann_topk).

Determinism spec (every float op is an ORDERED fold, so results are
bit-identical across engines and partitionings — k-means is normally
the poster child of nondeterministic float reduction; this one
hash-matches a DuckDB twin):

- init: centroids = the k corpus vectors with the smallest (portable
  bucket hash(id, seed), id) — a deterministic "random" draw (the
  sampling.py hash).
- assignment: cluster(x) = argmin_j sum_dims (x_d - c_jd)^2, the sum
  folded LEFT-TO-RIGHT over dims (F.aggregate / list_reduce), ties
  -> smallest j.
- update: centroid_j = (fold of member vectors in ASCENDING id order,
  element-wise) / |members| — portable mode sorts each cluster's
  members (collect_list + sort_array) so the double sum has ONE
  order; empty clusters keep their previous centroid. `mode="fast"`
  swaps the ordered fold for a plain per-dim avg (map-side partial
  agg, the 100 TB path — statistically identical, bitwise
  unordered; same portable/fast split as texthash).
- per round, the k x d centroid matrix is collected to the driver
  (tiny) and re-broadcast as literals — the standard distributed
  Lloyd shape (assignment scans the corpus; the model state is
  driver-sized).

Scale shape: assignment is one narrow pass with k fold expressions
in whole-stage codegen (no shuffle); the portable update is one
exchange keyed on cluster (k groups); the fast update is a per-dim
partial agg. IVF search joins the |Q| x nprobe probe table (tiny,
broadcast) against the cluster column, so the exact cosine runs on
~nprobe/k of the corpus per query instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graftlink.sampling import _bucket_col, _bucket_sql
from graftlink.similarity import _as_double, _dot, with_norm


def _sqdist(vec, cen: list[float]) -> F.Column:
    """Left-fold sum of squared differences against literal centroid."""
    lit = F.array(*[F.lit(float(x)) for x in cen])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(df: DataFrame, cents: list[list[float]], id_col: str) -> DataFrame:
    """DF[id, cluster] — argmin of the k fold distances, ties -> min j."""
    dists = F.array(*[_sqdist(F.col("_v"), c) for c in cents])
    return df.select(
        F.col(id_col).alias("id"),
        "_v",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("long").alias(
            "cluster"
        ),
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    seed: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "portable",
    checkpoint_dir: str | None = None,
    resume: bool = False,
    fingerprint: str = "",
) -> tuple[DataFrame, list[list[float]]]:
    """(DF[id, cluster], centroids) — module docstring spec; the
    returned assignment is against the centroids AFTER `iters`
    updates.

    Resume contract: the model state is the k x d centroid matrix —
    driver-sized — so each Lloyd round checkpoints it as an atomic
    JSON sidecar (fingerprint + iteration + centroids; Python's JSON
    round-trips doubles exactly), and a resumed run continues from
    the last saved round bit-identically."""
    import json as _json
    import os as _os
    base = df.select(
        F.col(id_col).alias(id_col), _as_double(F.col(vec_col)).alias("_v")
    ).persist()
    seeds = (
        base.select(
            id_col, "_v", _bucket_col(F.col(id_col), seed, "portable").alias("_b")
        )
        .orderBy(F.col("_b").asc(), F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    ckdir = _os.path.join(checkpoint_dir, "kmeans") if checkpoint_dir else None
    start_iter = 0
    cents = None
    if resume and ckdir and _os.path.isdir(ckdir):
        its = sorted(
            int(f[3:-5]) for f in _os.listdir(ckdir)
            if f.startswith("it=") and f.endswith(".json")
        )
        for it in reversed(its):
            with open(_os.path.join(ckdir, f"it={it}.json")) as fh:
                st = _json.load(fh)
            if st.get("fingerprint") == fingerprint:
                cents = st["centroids"]
                start_iter = it + 1
                break
    if cents is None:
        cents = [list(r["_v"]) for r in seeds]
    d = len(cents[0])
    if ckdir:
        _os.makedirs(ckdir, exist_ok=True)
    for _t in range(start_iter, iters):
        assigned = _assign(base, cents, id_col)
        if mode == "portable":
            # ordered fold: one exchange on cluster; members sorted by
            # id so the double sum has a single, engine-portable order
            rows = (
                assigned.groupBy("cluster")
                .agg(
                    F.count("*").alias("n"),
                    F.aggregate(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct(F.col("id"), F.col("_v")))
                            ),
                            lambda s: s["_v"],
                        ),
                        F.array_repeat(F.lit(0.0), d),
                        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                    ).alias("_sum"),
                )
                .select(
                    "cluster",
                    F.transform(
                        "_sum", lambda s: s / F.col("n").cast("double")
                    ).alias("_c"),
                )
                .collect()
            )
        else:
            # fast path: per-dim partial-agg means (map-side combine)
            rows = (
                assigned.select("cluster", F.posexplode("_v").alias("dim", "val"))
                .groupBy("cluster")
                .pivot("dim", list(range(d)))
                .avg("val")
                .collect()
            )
            rows = [
                {"cluster": r["cluster"], "_c": [r[str(i)] for i in range(d)]}
                for r in rows
            ]
        new = {r["cluster"]: list(r["_c"]) for r in rows}
        cents = [new.get(j, cents[j]) for j in range(k)]  # empty keeps old
        if ckdir:
            tmp = _os.path.join(ckdir, f"it={_t}.json.tmp")
            with open(tmp, "w") as fh:
                _json.dump(
                    {"fingerprint": fingerprint, "iteration": _t,
                     "centroids": cents}, fh,
                )
            _os.replace(tmp, _os.path.join(ckdir, f"it={_t}.json"))
    out = _assign(base, cents, id_col).select("id", "cluster")
    base.unpersist()
    return out, cents


def kmeans_clusters(
    df: DataFrame, k: int = 8, iters: int = 3, seed: int = 1, **kw
) -> DataFrame:
    """DF[id, cluster] — the driver-facing k-means surface."""
    out, _ = kmeans(df, k=k, iters=iters, seed=seed, **kw)
    return out


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    km_k: int = 8,
    iters: int = 3,
    seed: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "portable",
) -> DataFrame:
    """DF[query_id, neighbor_id, cos] — IVF search: probe the nprobe
    cells whose centroids are nearest each query (same fold distance,
    ties -> min cluster), exact cosine inside the probed cells only.
    Self-matches excluded; output convention identical to
    cosine_topk (round-6 cos, ties -> min neighbor_id)."""
    assigned, cents = kmeans(
        df, k=km_k, iters=iters, seed=seed, id_col=id_col, vec_col=vec_col,
        mode=mode,
    )
    corpus = (
        with_norm(df, vec_col)
        .select(F.col(id_col).alias("neighbor_id"), "_v", "_norm")
        .join(
            assigned.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
        )
    )
    q = with_norm(df.where(F.col(id_col).isin(query_ids)), vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"),
    )
    qd = q.select(
        "query_id",
        "_qv",
        "_qnorm",
        F.posexplode(
            F.array(*[_sqdist(F.col("_qv"), c) for c in cents])
        ).alias("cluster", "_cd"),
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.col("_cd").asc(), F.col("cluster").asc()
    )
    probes = (
        qd.withColumn("_pr", F.row_number().over(pw))
        .where(F.col("_pr") <= nprobe)
        .select("query_id", "_qv", "_qnorm", "cluster")
    )
    cos = F.when(
        (F.col("_norm") > 0) & (F.col("_qnorm") > 0),
        _dot(F.col("_qv"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm")),
    ).otherwise(F.lit(0.0))
    scored = (
        corpus.join(F.broadcast(probes), "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


# ---------------------------------------------------------------------------
# DuckDB twins (unrolled Lloyd rounds, every float op the same fold)
# ---------------------------------------------------------------------------

_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_FOLD = "list_reduce(list_prepend(0.0, {terms}), (acc, v) -> acc + v)"


def _sqdist_sql(vexpr: str, cexpr: str) -> str:
    terms = f"list_transform(list_zip({vexpr}, {cexpr}), s -> (s[1] - s[2]) * (s[1] - s[2]))"
    return _FOLD.format(terms=terms)


def _kmeans_layers_sql(
    table: str, k: int, iters: int, seed: int, id_col: str
) -> tuple[str, str]:
    """Shared CTE prelude ending in the final assignment `a{iters+1}`
    (and centroids `c{iters}`)."""
    parts = [
        f"""base AS MATERIALIZED (
            SELECT {id_col} AS id, {_V} AS v FROM ({table})
        )""",
        f"""c0 AS MATERIALIZED (
            SELECT row_number() OVER (
                ORDER BY {_bucket_sql('id', seed)}, id
            ) - 1 AS cluster, v AS c
            FROM base QUALIFY row_number() OVER (
                ORDER BY {_bucket_sql('id', seed)}, id
            ) <= {k}
        )""",
    ]
    prev_c = "c0"
    for t in range(1, iters + 1):
        parts.append(
            f"""a{t} AS MATERIALIZED (
            SELECT id, v, cluster FROM (
                SELECT b.id, b.v, c.cluster,
                       row_number() OVER (
                           PARTITION BY b.id
                           ORDER BY {_sqdist_sql('b.v', 'c.c')} ASC,
                                    c.cluster ASC
                       ) AS rn
                FROM base b CROSS JOIN {prev_c} c
            ) WHERE rn = 1
        )"""
        )
        parts.append(
            f"""c{t} AS MATERIALIZED (
            SELECT p.cluster,
                   coalesce(u.c, p.c) AS c
            FROM {prev_c} p
            LEFT JOIN (
                SELECT cluster,
                       list_transform(
                           list_reduce(vs, (acc, x) ->
                               list_transform(list_zip(acc, x),
                                              s -> s[1] + s[2])),
                           x -> x / n
                       ) AS c
                FROM (
                    SELECT cluster, list(v ORDER BY id) AS vs,
                           CAST(count(*) AS DOUBLE) AS n
                    FROM a{t} GROUP BY cluster
                )
            ) u ON u.cluster = p.cluster
        )"""
        )
        prev_c = f"c{t}"
    parts.append(
        f"""a{iters + 1} AS MATERIALIZED (
            SELECT id, v, cluster FROM (
                SELECT b.id, b.v, c.cluster,
                       row_number() OVER (
                           PARTITION BY b.id
                           ORDER BY {_sqdist_sql('b.v', 'c.c')} ASC,
                                    c.cluster ASC
                       ) AS rn
                FROM base b CROSS JOIN {prev_c} c
            ) WHERE rn = 1
        )"""
    )
    return ",\n        ".join(parts), prev_c


def kmeans_sql(
    table: str = "SELECT * FROM embeddings",
    k: int = 8,
    iters: int = 3,
    seed: int = 1,
    id_col: str = "vec_id",
) -> str:
    layers, _ = _kmeans_layers_sql(table, k, iters, seed, id_col)
    return f"""
        WITH
        {layers}
        SELECT id, cluster FROM a{iters + 1}
    """


def ivf_topk_sql(
    table: str = "SELECT * FROM embeddings",
    query_pred: str = "vec_id % 61 = 0",
    k: int = 5,
    nprobe: int = 2,
    km_k: int = 8,
    iters: int = 3,
    seed: int = 1,
    id_col: str = "vec_id",
) -> str:
    layers, final_c = _kmeans_layers_sql(table, km_k, iters, seed, id_col)
    norm = _FOLD.format(terms="list_transform(v, x -> x * x)")
    dot = _FOLD.format(terms="list_transform(list_zip(q.v, b.v), s -> s[1] * s[2])")
    return f"""
        WITH
        {layers},
        nrm AS MATERIALIZED (
            SELECT a.id, a.v, a.cluster, sqrt({norm}) AS nrm
            FROM a{iters + 1} a
        ),
        qv AS (
            SELECT * FROM nrm WHERE {query_pred.replace(id_col, 'id')}
        ),
        probes AS (
            SELECT query_id, cluster FROM (
                SELECT q.id AS query_id, c.cluster,
                       row_number() OVER (
                           PARTITION BY q.id
                           ORDER BY {_sqdist_sql('q.v', 'c.c')} ASC,
                                    c.cluster ASC
                       ) AS pr
                FROM qv q CROSS JOIN {final_c} c
            ) WHERE pr <= {nprobe}
        ),
        scored AS (
            SELECT q.id AS query_id, b.id AS neighbor_id,
                   round(CASE WHEN b.nrm > 0 AND q.nrm > 0
                         THEN {dot} / (q.nrm * b.nrm)
                         ELSE 0.0 END, 6) AS cos
            FROM nrm b
            JOIN probes p ON p.cluster = b.cluster
            JOIN qv q ON q.id = p.query_id
            WHERE b.id != q.id
        )
        SELECT query_id, neighbor_id, cos FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC
            ) AS rn FROM scored
        ) WHERE rn <= {k}
    """
