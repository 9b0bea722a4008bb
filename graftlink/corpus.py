"""Corpus-curation operators for web-scale training pipelines:
per-domain caps, repetition signals, and benchmark decontamination.

These are the Common-Crawl-pipeline steps downstream of dedup
(dedup.py) and quality scoring (textops.py):

- **per_domain_cap** — cap documents per registrable domain so a few
  template-heavy hosts don't dominate the corpus (every published CC
  pipeline does this; e.g. the C4 and Gopher recipes cap or weight by
  domain).
- **repetition_signals** — Gopher-style per-document repetition
  measures: duplicate-line fraction and the fraction of word bigrams
  occupied by the single most frequent bigram. High values flag
  boilerplate / keyword-stuffing pages that survive exact dedup.
- **decontaminate** — n-gram overlap against a benchmark/eval set:
  any document sharing a w-token shingle with the benchmark is
  flagged, so eval data cannot leak into training data. Reuses the
  portable shingle spec (texthash.shingle_hashes) so the operator is
  value-hash-checked against a DuckDB twin.

Scale shapes (100 TB):
- per_domain_cap is the classic per-key-top-k skew trap (one window
  partition per domain concentrates a 10^9-page host on one reducer).
  The implementation is two-phase: a salted local top-cap bounds every
  window partition at ~|domain|/S rows, then a global top-cap runs on
  at most S*cap survivors per domain. The salt never changes the
  RESULT (both phases use the same total order), only the partition
  sizes — so the single-window DuckDB twin still hash-matches.
- repetition_signals: duplicate-line fraction is a pure column
  expression (no shuffle); the top-bigram fraction explodes bigrams
  and aggregates keyed by (doc_id, gram) — partial-agg combines the
  repeated grams map-side, which is exactly the skew being measured.
- decontaminate: the benchmark side is small by construction (eval
  sets are thousands of documents, not billions) — its distinct
  shingle hashes broadcast; the corpus side is a projected
  explode + broadcast LEFT SEMI join, no corpus shuffle at all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from graftlink.texthash import (shingle_hashes, shingle_hashes_sql,
                                window_hashes, window_hashes_sql)


def per_domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    priority: list | None = None,
    id_col: str = "doc_id",
    salts: int = 16,
) -> DataFrame:
    """Keep at most `cap` rows per domain, chosen by the given
    priority column order (default: id_col ascending — deterministic).
    Priority entries are Column expressions or column names; id_col is
    always appended as the final tie-break so the kept set is a total-
    order prefix (unique, engine-independent)."""
    order = [F.col(c) if isinstance(c, str) else c for c in (priority or [])]
    order.append(F.col(id_col).asc())
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts))
    local = Window.partitionBy(F.col(domain_col), salt).orderBy(*order)
    survivors = (
        df.withColumn("_rn", F.row_number().over(local))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )
    final = Window.partitionBy(F.col(domain_col)).orderBy(*order)
    return (
        survivors.withColumn("_rn", F.row_number().over(final))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def per_domain_cap_sql(
    source_sql: str,
    domain_col: str,
    cap: int,
    order_sql: str,
) -> str:
    """DuckDB twin: the plain one-window formulation."""
    return f"""
        SELECT * EXCLUDE (_rn) FROM (
            SELECT *, row_number() OVER (
                PARTITION BY {domain_col} ORDER BY {order_sql}
            ) AS _rn
            FROM ({source_sql})
        ) WHERE _rn <= {cap}
    """


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DF[id, dup_line_frac, top_bigram_frac] — Gopher-style
    repetition measures, rounded to 6dp for cross-engine hashing."""
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))) / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))

    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # greatest(n-1, 0): slice() rejects negative lengths (empty docs)
    m = F.greatest(n - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )

    base = df.select(
        F.col(id_col).alias("id"),
        F.round(dup_line, 6).alias("dup_line_frac"),
        grams.alias("_grams"),
        F.size(grams).cast("double").alias("_n_grams"),
    )
    counts = (
        base.select("id", "_n_grams", F.explode_outer("_grams").alias("_g"))
        .groupBy("id", "_n_grams", "_g")
        .agg(F.count("_g").alias("_c"))
        .groupBy("id", "_n_grams")
        .agg(F.max("_c").alias("_top"))
    )
    return counts.select(
        "id",
        F.round(
            F.when(F.col("_n_grams") > 0, F.col("_top") / F.col("_n_grams"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
    ).join(base.select("id", "dup_line_frac"), "id").select(
        "id", "dup_line_frac", "top_bigram_frac"
    )


def repetition_signals_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    return f"""
        WITH base AS (
            SELECT {id_col} AS id,
                   string_split({text_col}, chr(10)) AS lines,
                   string_split_regex(lower({text_col}), '\\s+') AS toks
            FROM {table}
        ),
        lined AS (
            SELECT id,
                   CASE WHEN len(lines) > 0
                        THEN round((len(lines) - len(list_distinct(lines)))
                                   / CAST(len(lines) AS DOUBLE), 6)
                        ELSE 0.0 END AS dup_line_frac,
                   toks
            FROM base
        ),
        grams AS (
            SELECT id, dup_line_frac,
                   CASE WHEN len(toks) >= 2
                        THEN [toks[i] || ' ' || toks[i + 1]
                              for i in range(1, len(toks))]
                        ELSE [] END AS gs
            FROM lined
        ),
        exploded AS (
            SELECT id, dup_line_frac, len(gs) AS n_grams, u.g AS g
            FROM grams LEFT JOIN UNNEST(gs) AS u(g) ON TRUE
        ),
        top AS (
            SELECT id, dup_line_frac, n_grams, max(c) AS top_c
            FROM (
                SELECT id, dup_line_frac, n_grams, g, count(g) AS c
                FROM exploded GROUP BY 1, 2, 3, 4
            ) GROUP BY 1, 2, 3
        )
        SELECT id, dup_line_frac,
               CASE WHEN n_grams > 0
                    THEN round(top_c / CAST(n_grams AS DOUBLE), 6)
                    ELSE 0.0 END AS top_bigram_frac
        FROM top
    """


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    hash_mode: str = "portable",
) -> DataFrame:
    """DF[id, contaminated] — flag documents sharing any w-token
    shingle with the (small) benchmark set. Deliberately returns the
    full flag column rather than filtering, so pipelines can audit
    what would be dropped before dropping it."""
    bench = (
        benchmark.select(
            F.explode(
                shingle_hashes(F.col(text_col), w=w, hash_mode=hash_mode)
            ).alias("_h")
        )
        .distinct()
    )
    doc_shingles = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes(F.col(text_col), w=w, hash_mode=hash_mode)).alias(
            "_h"
        ),
    )
    hits = (
        doc_shingles.join(F.broadcast(bench), "_h", "left_semi")
        .select("id")
        .distinct()
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits.withColumn("_hit", F.lit(True)), "id", "left")
        .select("id", F.coalesce("_hit", F.lit(False)).alias("contaminated"))
    )


def decontaminate_sql(
    docs_sql: str,
    benchmark_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
) -> str:
    sh = shingle_hashes_sql(text_col, w=w)
    return f"""
        WITH bench AS MATERIALIZED (
            SELECT DISTINCT u.h AS h
            FROM (SELECT {sh} AS hs FROM ({benchmark_sql})) b,
                 UNNEST(b.hs) AS u(h)
        ),
        doc_sh AS (
            SELECT d.{id_col} AS id, u.h AS h
            FROM (SELECT {id_col}, {sh} AS hs FROM ({docs_sql})) d,
                 UNNEST(d.hs) AS u(h)
        )
        SELECT d.{id_col} AS id,
               coalesce(hit.c, FALSE) AS contaminated
        FROM ({docs_sql}) d
        LEFT JOIN (
            SELECT id, TRUE AS c FROM doc_sh
            WHERE h IN (SELECT h FROM bench) GROUP BY id
        ) hit ON hit.id = d.{id_col}
    """

def curate(
    docs: DataFrame,
    quality_min: float = 0.4,
    near_dup_threshold: float = 0.5,
    domain_cap: int = 20,
    split_weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
    hash_mode: str = "portable",
) -> DataFrame:
    """DF[doc_id, source, split] — the full curation pipeline, the
    order every published web-corpus recipe uses: quality filter →
    exact dedup (keep min id per text) → MinHash near-dup CLUSTER
    drop (connected components over the near-dup pair graph, keeper =
    min doc_id per component — the GPT-3/Gopher cluster-keeper recipe;
    round 4 replaced the greedy per-pair drop, which could
    cascade-delete a doc whose designated keeper was itself dropped)
    → per-domain cap (priority: longer docs first) → train/val/test
    split assignment.

    Each stage is the already-tested operator. The document-side
    program is one lazy plan — Catalyst prunes documents columns to
    (id, text, source, n_chars) at the scan and the text column never
    survives past the dedup stages; the only materialized side input
    is the near-dup PAIR graph (pairs << corpus by construction),
    whose component labels come from the engine's own
    connected_components loop."""
    from graftlink.components import connected_components
    from graftlink.dedup import exact_dedup, near_dup_minhash
    from graftlink.sampling import assign_splits
    from graftlink.textops import quality_scores

    q = quality_scores(docs, text_col, id_col)
    s1 = docs.join(
        q.where(F.col("quality") >= quality_min).select("id"),
        F.col(id_col) == F.col("id"),
        "left_semi",
    )
    keepers = exact_dedup(s1, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    s2 = s1.join(keepers, id_col, "left_semi")
    nd = near_dup_minhash(
        s2, text_col, id_col,
        threshold=near_dup_threshold, hash_mode=hash_mode,
    )
    # cluster the near-dup pairs; component label (renumber=False) IS
    # the min doc_id of the cluster = the canonical keeper
    comp = connected_components(
        nd.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        renumber=False,
        checkpoint_mode="local",
    )
    drop = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    s3 = s2.join(drop, id_col, "left_anti")
    s4 = per_domain_cap(
        s3.select(id_col, domain_col, "n_chars"),
        domain_col,
        domain_cap,
        priority=[F.col("n_chars").desc()],
        id_col=id_col,
    )
    return assign_splits(
        s4, id_col, split_weights, hash_mode=hash_mode
    ).select(id_col, domain_col, "split")


def curate_sql(
    quality_min: float = 0.4,
    near_dup_threshold: float = 0.5,
    domain_cap: int = 20,
    split_weights: dict[str, float] | None = None,
) -> str:
    from graftlink.dedup import near_dup_minhash_sql
    from graftlink.sampling import assign_splits_sql
    from graftlink.textops import quality_scores_sql

    nd = near_dup_minhash_sql(table="s2", threshold=near_dup_threshold)
    capped = per_domain_cap_sql(
        "SELECT doc_id, source, n_chars FROM s3",
        "source",
        domain_cap,
        "n_chars DESC, doc_id",
    )
    split = assign_splits_sql(
        "SELECT doc_id, source FROM s4", "doc_id", split_weights
    )
    return f"""
        WITH RECURSIVE
        q AS MATERIALIZED ({quality_scores_sql()}),
        s1 AS MATERIALIZED (
            SELECT d.* FROM documents d
            JOIN q ON q.id = d.doc_id AND q.quality >= {quality_min}
        ),
        s2 AS MATERIALIZED (
            SELECT d.* FROM s1 d
            JOIN (SELECT min(doc_id) AS k FROM s1 GROUP BY text) kk
              ON kk.k = d.doc_id
        ),
        nd AS MATERIALIZED ({nd}),
        -- near-dup CLUSTER canonicalization (mirrors the Spark side's
        -- connected_components over the pair graph): transitive
        -- closure of the symmetric pair set, keeper = min reachable
        -- id; the closure runs on pairs only (pairs << corpus)
        undp AS MATERIALIZED (
            SELECT a, b FROM nd UNION SELECT b, a FROM nd
        ),
        reach(id, r) AS (
            SELECT a, b FROM undp
            UNION
            SELECT re.id, u.b FROM reach re JOIN undp u ON u.a = re.r
        ),
        dropped AS MATERIALIZED (
            SELECT id FROM reach GROUP BY id HAVING min(r) < id
        ),
        s3 AS MATERIALIZED (
            SELECT * FROM s2
            WHERE doc_id NOT IN (SELECT id FROM dropped)
        ),
        s4 AS MATERIALIZED ({capped})
        SELECT doc_id, source, split FROM ({split})
    """


def rebalance_sources(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 1,
    hash_mode: str = "portable",
) -> DataFrame:
    """Deterministic downsample-only mixture rebalancing: keep
    floor(C * t_s) docs of each source where C = min_s(n_s / t_s), so
    the output hits the target proportions EXACTLY (up to floor)
    while retaining 100% of the scarcest source — the standard
    feasible-mixture rule every LLM data recipe applies before
    up-weighting at training time (e.g. the Pile / LLaMA mixture
    tables). Sources absent from `targets` (or with weight 0) are
    dropped.

    Membership is a total-order prefix per source under (portable
    bucket hash of id, id) — the per_domain_cap discipline — so the
    kept set is a pure function of (corpus, targets, seed): stable
    under retries, partitionings, and engines. The per-source counts
    are one tiny aggregate (#sources rows, collected); caps broadcast
    back; selection is the salted two-phase top-k, never one reducer
    per hot source.
    """
    from graftlink.sampling import _bucket_col

    if not targets or all(w <= 0 for w in targets.values()):
        raise ValueError("targets must contain at least one positive weight")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    active = {s: w for s, w in targets.items() if w > 0 and counts.get(s, 0) > 0}
    if not active:
        raise ValueError("no target source present in the data")
    c_scale = min(counts[s] / w for s, w in active.items())
    caps = {s: int(math.floor(c_scale * w)) for s, w in active.items()}
    spark = df.sparkSession
    caps_df = spark.createDataFrame(
        [(s, c) for s, c in sorted(caps.items())], f"{source_col} string, _cap long"
    )
    b = _bucket_col(F.col(id_col), seed, hash_mode)
    order = [b.asc(), F.col(id_col).asc()]
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(16))
    capped = df.join(F.broadcast(caps_df), source_col)
    local = Window.partitionBy(F.col(source_col), salt).orderBy(*order)
    survivors = (
        capped.withColumn("_rn", F.row_number().over(local))
        .where(F.col("_rn") <= F.col("_cap"))
        .drop("_rn")
    )
    final = Window.partitionBy(F.col(source_col)).orderBy(*order)
    return (
        survivors.withColumn("_rn", F.row_number().over(final))
        .where(F.col("_rn") <= F.col("_cap"))
        .select(*df.columns)  # the caps join moved source_col first
    )


def rebalance_sources_sql(
    docs_sql: str,
    targets: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 1,
) -> str:
    """DuckDB twin: caps computed in-SQL with the identical float
    expression (n/w doubles, min, floor) so the boundary rounds the
    same way in both engines."""
    from graftlink.sampling import _bucket_sql

    vals = ", ".join(
        f"('{s}', CAST({w!r} AS DOUBLE))" for s, w in sorted(targets.items()) if w > 0
    )
    b = _bucket_sql(id_col, seed)
    return f"""
        WITH src AS MATERIALIZED ({docs_sql}),
        t({source_col}, w) AS (VALUES {vals}),
        cnt AS (
            SELECT {source_col}, count(*) AS n FROM src GROUP BY {source_col}
        ),
        cmin AS (
            SELECT min(cnt.n / t.w) AS c
            FROM cnt JOIN t USING ({source_col})
        ),
        caps AS (
            SELECT t.{source_col},
                   CAST(floor((SELECT c FROM cmin) * t.w) AS BIGINT) AS cap
            FROM t JOIN cnt USING ({source_col})
        ),
        ranked AS (
            SELECT src.*, row_number() OVER (
                PARTITION BY {source_col}
                ORDER BY {b}, {id_col}
            ) AS _rn
            FROM src
        )
        SELECT ranked.* EXCLUDE (_rn)
        FROM ranked JOIN caps USING ({source_col})
        WHERE _rn <= caps.cap
    """


def span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 16,
    threshold: float = 0.5,
    hash_mode: str = "portable",
) -> DataFrame:
    """DF[id, n_windows, dup_windows, dup_frac, flagged] — CROSS-document
    span duplication (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better": exact substring matches of ~50
    tokens across documents; bounded here to fixed w-token sliding
    windows, the MapReduce-friendly restatement of their suffix-array
    pass). A window position counts as duplicated iff its hash occurs
    in >= 2 DISTINCT documents; intra-document repeats are the
    separate repetition_signals operator. flagged compares the
    ROUNDED dup fraction to the threshold so both engines decide the
    boundary identically.

    Scale shape: exploded rows carry (doc_id, 8-byte window hash) —
    text never shuffles; the cross-doc count and the per-doc rollup
    are two partial-agg groupBys keyed on the hash / the doc id, and
    the hash join between them is the line_dedup plan exactly.
    """
    wh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(window_hashes(F.col(text_col), w=w, hash_mode=hash_mode)).alias(
            "_h"
        ),
    )
    counts = wh.groupBy("_h").agg(F.count_distinct("id").alias("_nd"))
    per = (
        wh.join(counts, "_h")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum((F.col("_nd") >= 2).cast("long")).alias("dup_windows"),
        )
    )
    frac = F.round(F.col("dup_windows") / F.col("n_windows"), 6)
    return per.select(
        "id",
        "n_windows",
        "dup_windows",
        frac.alias("dup_frac"),
        (frac > threshold).alias("flagged"),
    )


def span_dedup_sql(
    docs_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 16,
    threshold: float = 0.5,
) -> str:
    wsql = window_hashes_sql(text_col, w=w)
    return f"""
        WITH wh AS MATERIALIZED (
            SELECT d.{id_col} AS id, u.h AS h
            FROM (SELECT {id_col}, {wsql} AS hs FROM ({docs_sql})) d,
                 UNNEST(d.hs) AS u(h)
        ),
        cnt AS MATERIALIZED (
            SELECT h, count(DISTINCT id) AS nd FROM wh GROUP BY h
        ),
        per AS (
            SELECT wh.id,
                   CAST(count(*) AS BIGINT) AS n_windows,
                   CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS dup_windows
            FROM wh JOIN cnt c ON c.h = wh.h
            GROUP BY wh.id
        )
        SELECT id, n_windows, dup_windows,
               round(dup_windows * 1.0 / n_windows, 6) AS dup_frac,
               round(dup_windows * 1.0 / n_windows, 6) > {threshold} AS flagged
        FROM per
    """


def line_dedup(
    docs: DataFrame,
    min_dup_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DF[doc_id, n_lines, n_removed, text_clean] — CROSS-corpus line
    deduplication, the C4/RefinedWeb recipe (within-doc repetition is
    repetition_signals): a line whose occurrence count across the
    WHOLE corpus reaches min_dup_count is boilerplate; every
    occurrence is dropped except the globally FIRST one (min
    (doc_id, pos) — "keep one copy", deterministic), and each doc's
    text is reassembled in original line order.

    100 TB shape: lines leave the doc row ONCE (posexplode); the
    global count + first-occurrence election group on a
    (xxhash64, md5) 40-byte key pair — the line TEXT itself is never
    the shuffle key (the exact_dedup discipline); survivors
    re-assemble with one groupBy(doc_id) over sort_array(collect_list)
    — output-sized, per-doc arrays bounded by doc length, no Window.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    keyed = lines.select(
        "doc_id", "pos", "line",
        F.xxhash64("line").alias("h"), F.md5("line").alias("fp"),
    )
    stats = keyed.groupBy("h", "fp").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct("doc_id", "pos")).alias("first"),
    )
    marked = keyed.join(stats.hint("shuffle_hash"), ["h", "fp"]).select(
        "doc_id", "pos", "line",
        (
            (F.col("cnt") >= min_dup_count)
            & ~(
                (F.col("first.doc_id") == F.col("doc_id"))
                & (F.col("first.pos") == F.col("pos"))
            )
        ).alias("drop"),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("drop").cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                ~F.col("drop"),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_clean"),
        )
        .select("doc_id", "n_lines", "n_removed", "text_clean")
    )


def line_dedup_sql(min_dup_count: int = 2) -> str:
    """DuckDB twin over the documents view (same keep-first
    contract, computed directly on the line text)."""
    return f"""
        WITH split AS (
            SELECT doc_id, string_split(text, chr(10)) AS parts
            FROM documents
        ),
        lines AS (
            SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS pos, parts[u.i] AS line
            FROM split, unnest(range(1, len(parts) + 1)) u(i)
        ),
        stats AS (
            SELECT line, count(*) AS cnt,
                   min(struct_pack(doc_id := doc_id, pos := pos)) AS first
            FROM lines GROUP BY line
        ),
        marked AS (
            SELECT l.doc_id, l.pos, l.line,
                   (s.cnt >= {min_dup_count}
                    AND NOT ((s.first).doc_id = l.doc_id
                             AND (s.first).pos = l.pos)) AS dropped
            FROM lines l JOIN stats s ON s.line = l.line
        )
        SELECT doc_id,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               coalesce(
                   string_agg(CASE WHEN NOT dropped THEN line END,
                              chr(10) ORDER BY pos),
                   '') AS text_clean
        FROM marked GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk) for LM training
# ---------------------------------------------------------------------------


def pack_chunks(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: concatenate every
    document's token stream in deterministic `id_col` order and split
    the global stream into fixed-length training sequences of
    `seq_len` tokens (documents may span chunk boundaries — the
    pack-then-split recipe used by GPT-2/3-style pretraining, as
    opposed to greedy no-split bin packing, which is inherently
    sequential).

    Returns the chunk *manifest* DF[chunk_id, doc_id, doc_tokens,
    off_in_chunk, tok_start, n_tokens]: one row per (chunk, document
    slice), all integers, exact. `tok_start` is the slice's offset
    inside the DOCUMENT, `off_in_chunk` its position inside the
    CHUNK; sum(n_tokens) per chunk == seq_len except the final chunk.
    Zero-token documents are dropped (they occupy no stream
    positions). The actual token gather is a groupBy(chunk_id) over
    this manifest — chunk contents co-partition by chunk_id.

    100 TB shape: the global running offset uses the same two-pass
    prefix-sum as the vertex dictionary (vertices.py `two_pass`) —
    range-repartition by doc_id, per-partition token sums collected
    to the driver (B longs, nothing else), then a streaming Arrow
    kernel adds partition offset + running local sum. No global
    Window, no sort beyond the range partitioner's, and the explode
    factor is 1 + boundary-crossings (bounded by total_tokens /
    seq_len). The per-doc token count is the portable whitespace
    tokenizer (texthash.tokens), so a DuckDB single-window twin
    replays the identical arithmetic."""
    from collections.abc import Iterator

    import pyarrow as pa

    from graftlink.texthash import tokens

    spark = docs.sparkSession
    b = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens(F.col(text_col))).cast("long").alias("ntok"),
        )
        .where(F.col("ntok") > 0)
    )
    ranged = (
        toks.repartitionByRange(b, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
        # fix partition assignment between the two passes
        # (repartitionByRange samples; a recompute must not resample)
        .localCheckpoint(eager=True)
    )
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum("ntok").alias("s")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        run = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if run is None:
                run = offsets[batch.column("_pid")[0].as_py()]
            nt = batch.column("ntok").to_pylist()
            starts = []
            for t in nt:
                starts.append(run)
                run += t
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("ntok"),
                    pa.array(starts, pa.int64()),
                ],
                ["doc_id", "ntok", "start"],
            )

    pos = ranged.mapInArrow(kernel, "doc_id long, ntok long, start long")
    L = int(seq_len)
    first_c = F.expr(f"start div {L}")
    last_c = F.expr(f"(start + ntok - 1) div {L}")
    sp = pos.select(
        "doc_id", "ntok", "start",
        F.explode(F.sequence(first_c, last_c)).alias("chunk_id"),
    )
    c0 = F.col("chunk_id") * F.lit(L)
    lo = F.greatest(F.col("start"), c0)
    hi = F.least(F.col("start") + F.col("ntok"), c0 + F.lit(L))
    return sp.select(
        "chunk_id",
        "doc_id",
        F.col("ntok").alias("doc_tokens"),
        (lo - c0).cast("long").alias("off_in_chunk"),
        (lo - F.col("start")).cast("long").alias("tok_start"),
        (hi - lo).cast("long").alias("n_tokens"),
    )


def pack_chunks_sql(tokens_expr: str, seq_len: int) -> str:
    """DuckDB twin: one global running-sum window ordered by doc_id
    (fine at oracle scale; the Spark side's two-pass prefix sum
    computes the identical integers), then unnest over the chunk
    span. All-integer arithmetic — exact."""
    L = int(seq_len)
    return f"""
        WITH toks AS (
            SELECT doc_id, CAST(len({tokens_expr}) AS BIGINT) AS ntok
            FROM documents
        ),
        pos AS (
            SELECT doc_id, ntok,
                   CAST(coalesce(sum(ntok) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS start
            FROM toks WHERE ntok > 0
        ),
        sp AS (
            SELECT doc_id, ntok, start,
                   unnest(range(start // {L}, (start + ntok - 1) // {L} + 1))
                       AS chunk_id
            FROM pos
        )
        SELECT chunk_id, doc_id, ntok AS doc_tokens,
               greatest(start, chunk_id * {L}) - chunk_id * {L} AS off_in_chunk,
               greatest(start, chunk_id * {L}) - start AS tok_start,
               least(start + ntok, (chunk_id + 1) * {L})
                   - greatest(start, chunk_id * {L}) AS n_tokens
        FROM sp
    """
