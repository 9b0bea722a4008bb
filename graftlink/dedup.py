"""Deduplication operators for large-scale training-data pipelines.

Four families, each scale-shaped for a 1000-executor / 100 TB corpus
and each oracle-checkable against a DuckDB SQL twin at test scale
(portable hashing from graftlink.texthash):

- exact:   hash-groupBy on full text. One shuffle on the text hash
           (never the text itself at scale — group on the 64-bit-ish
           hash, verify within group), min-id keeper.
- MinHash+LSH (Broder 1997 / Leskovec MMDS ch.3): shingle -> k-wide
           signature -> band buckets -> bucket equi-join for candidate
           pairs -> exact Jaccard verify on shingle sets. The band
           join is the only shuffle that touches pairs, and its size
           is sum over buckets of |bucket|^2, not n^2.
- SimHash (Charikar 2002): 24-bit fingerprint, near-dups = hamming
           distance <= 2. Exact at that radius via 3x8-bit band LSH
           (pigeonhole: d<=2 differing bits leave >=1 of 3 bands
           identical), so the banded plan returns EXACTLY the same
           pairs as the O(n^2) scan the oracle runs.
- n-gram Jaccard: exact pairwise similarity on candidate pairs
           (array_intersect/array_union on distinct shingle-hash
           sets) — the verify stage of MinHash, exposed standalone.

Embedding-cosine near-dup lives in graftlink.similarity (shares the
cosine kernel with ANN search).

igraph/Graphina have no dedup surface — this layer is the engine's
training-data extension (SURVEY.md §2B scope note); semantics follow
the published algorithms cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.texthash import (
    MINHASH_K,
    PRIME,
    minhash_signature,
    minhash_signature_sql,
    shingle_hashes,
    shingle_hashes_sql,
    simhash,
    simhash_sql,
)

LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS
SIMHASH_BITS = 24
SIMHASH_BANDS = 3
SIMHASH_RADIUS = 2  # max hamming distance; exact with 3 bands (pigeonhole)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
    verify: str = "fingerprint",
) -> DataFrame:
    """DF[keeper_id, n_copies] — one row per distinct text, keeper =
    min id.

    The 100 TB plan (default): shuffle (xxhash64, md5-fingerprint, id)
    — ~40 bytes/row — instead of the full text (KBs/row), group on
    (hash, fingerprint). The md5 is the in-group verify: two DIFFERENT
    texts colliding on the 64-bit hash still split into separate
    groups (collision-injection test passes a deliberately weak
    hash_fn and asserts the result still equals groupBy(text)).
    Equality beyond that rests on 128-bit-fingerprint uniqueness;
    verify="text" groups on (hash, text) for belt-and-braces exactness
    at the cost of shuffling the text.

    hash_fn: column -> column override of xxhash64 (testing seam).
    """
    h = (hash_fn or F.xxhash64)(F.col(text_col))
    if verify == "text":
        discriminator = F.col(text_col)
    elif verify == "fingerprint":
        discriminator = F.md5(F.col(text_col))
    else:
        raise ValueError(f"unknown verify mode: {verify}")
    return (
        df.select(
            h.alias("_h"),
            discriminator.alias("_fp"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("_h", "_fp")
        .agg(F.min("_id").alias("keeper_id"), F.count("*").alias("n_copies"))
        .select("keeper_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    w: int = 3, k: int = MINHASH_K, hash_mode: str = "portable",
) -> DataFrame:
    """DF[id, shingles array<long>, sig array<long>]. One narrow pass
    over the corpus — no shuffle; signature is k JVM array_min's."""
    sh = shingle_hashes(F.col(text_col), w=w, hash_mode=hash_mode)
    return df.select(
        F.col(id_col).alias("id"),
        sh.alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles"), k=k))


def sig_fold(sig) -> F.Column:
    """Fold an array<long> MinHash signature into ONE canonical int64
    (polynomial fold, same arithmetic as texthash.poly_hash). The
    driver's result canonicalizer sorts/hashes scalar cells and cannot
    order array columns, so the driver-facing signature query emits
    this fold; the DuckDB twin computes the identical fold."""
    return F.aggregate(
        sig, F.lit(0).cast("long"), lambda acc, v: (acc * 31 + v) % PRIME
    )


def sig_fold_sql(sig_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {sig_expr}), "
        f"(acc, v) -> (acc*31 + v) % {PRIME})"
    )


def _band_hash(sig, band: int, rows: int):
    """Combine one band's signature rows into a single int64 bucket key."""
    h = F.lit(0).cast("long")
    for r in range(rows):
        h = (h * 31 + F.element_at(sig, band * rows + r + 1)) % PRIME
    return (h * 31 + F.lit(band)) % PRIME


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = LSH_BANDS, k: int = MINHASH_K
) -> DataFrame:
    """DF[a, b] (a<b) — pairs agreeing on >=1 LSH band.

    Plan: explode to (band, bhash, id) — bands*n rows — then
    self-equi-join on (band, bhash) and distinct. Shuffle cost is the
    band table, not the corpus; hub buckets (boilerplate-heavy shards)
    are bounded because a bucket only forms within one band value.
    """
    rows = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"), _band_hash(F.col("sig"), j, rows).alias("bhash")
            )
            for j in range(bands)
        ]
    )
    bt = sigs.select("id", F.explode(band_structs).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash")
    )
    l = bt.alias("l")
    r = bt.alias("r")
    return (
        l.join(r, ["band", "bhash"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )


def jaccard_pairs(sigs: DataFrame, pairs: DataFrame) -> DataFrame:
    """DF[a, b, jaccard] — exact n-gram Jaccard on candidate pairs,
    via two co-keyed joins pulling the distinct shingle sets."""
    sa = sigs.select(F.col("id").alias("a"), F.col("shingles").alias("sh_a"))
    sb = sigs.select(F.col("id").alias("b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
    )


def near_dup_minhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.5, hash_mode: str = "portable",
) -> DataFrame:
    """DF[a, b, jaccard] — LSH candidates verified at >= threshold."""
    sigs = minhash_signatures(df, text_col, id_col, hash_mode=hash_mode)
    pairs = lsh_candidate_pairs(sigs)
    return jaccard_pairs(sigs, pairs).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_mode: str = "portable",
) -> DataFrame:
    """DF[id, simhash long] — narrow map, no shuffle."""
    return df.select(
        F.col(id_col).alias("id"),
        simhash(F.col(text_col), bits=SIMHASH_BITS, hash_mode=hash_mode).alias("simhash"),
    )


def simhash_near_dups(fps: DataFrame, radius: int = SIMHASH_RADIUS) -> DataFrame:
    """DF[a, b, hamming] — all pairs with hamming(simhash) <= radius.

    Banded: each fingerprint is exploded into 3 8-bit chunks; pairs
    sharing any (chunk_idx, chunk_val) are candidates; the hamming
    filter then makes the result EXACT for radius <= 2 (pigeonhole
    over 3 bands), matching the oracle's O(n^2) scan while shuffling
    only bucket-local pairs.
    """
    if radius > SIMHASH_RADIUS:
        raise ValueError(
            f"banded simhash near-dup is exact only for radius <= "
            f"{SIMHASH_RADIUS} ({SIMHASH_BANDS} bands, pigeonhole); "
            f"got radius={radius} — raise SIMHASH_BANDS to radius+1 "
            f"bands to widen the guarantee"
        )
    chunk_bits = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << chunk_bits) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("ci"),
                ((F.col("simhash") % F.lit(1 << ((c + 1) * chunk_bits)))
                 / F.lit(1 << (c * chunk_bits))).cast("long").bitwiseAND(F.lit(mask)).alias("cv"),
            )
            for c in range(SIMHASH_BANDS)
        ]
    )
    ct = fps.select("id", "simhash", F.explode(chunks).alias("c")).select(
        "id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    l = ct.alias("l")
    r = ct.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        l.join(r, ["ci", "cv"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"), F.col("r.id").alias("b"), ham.alias("hamming")
        )
        .where(F.col("hamming") <= radius)
        .distinct()
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def minhash_signatures_sql(table: str = "documents", text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    sh = shingle_hashes_sql(text_col)
    return (
        f"SELECT {id_col} AS id, {minhash_signature_sql(sh)} AS sig FROM {table}"
    )


def _band_hash_sql(band: int, rows: int = LSH_ROWS) -> str:
    h = "0"
    for r in range(rows):
        h = f"(({h})*31 + sig[{band * rows + r + 1}]) % {PRIME}"
    return f"(({h})*31 + {band}) % {PRIME}"


def lsh_candidate_pairs_sql(table: str = "documents", text_col: str = "text",
                            id_col: str = "doc_id", bands: int = LSH_BANDS) -> str:
    sigs = minhash_signatures_sql(table, text_col, id_col)
    band_rows = " UNION ALL ".join(
        f"SELECT id, {j} AS band, {_band_hash_sql(j)} AS bhash FROM sigs"
        for j in range(bands)
    )
    return f"""
        WITH sigs AS ({sigs}), bt AS ({band_rows})
        SELECT DISTINCT l.id AS a, r.id AS b
        FROM bt l JOIN bt r ON l.band = r.band AND l.bhash = r.bhash AND l.id < r.id
    """


def near_dup_minhash_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id", threshold: float = 0.5) -> str:
    pairs = lsh_candidate_pairs_sql(table, text_col, id_col)
    sh = shingle_hashes_sql(text_col)
    return f"""
        WITH shs AS (SELECT {id_col} AS id, {sh} AS sh FROM {table}),
        pairs AS ({pairs})
        SELECT p.a, p.b,
               round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                     / greatest(len(list_distinct(list_concat(sa.sh, sb.sh))), 1),
                     6) AS jaccard
        FROM pairs p JOIN shs sa ON p.a = sa.id JOIN shs sb ON p.b = sb.id
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / greatest(len(list_distinct(list_concat(sa.sh, sb.sh))), 1) >= {threshold}
    """


def simhash_near_dups_sql(table: str = "documents", text_col: str = "text",
                          id_col: str = "doc_id", radius: int = SIMHASH_RADIUS) -> str:
    """O(n^2) scan — the semantic spec the banded Spark plan must equal."""
    fp = simhash_sql(text_col, bits=SIMHASH_BITS)
    return f"""
        WITH fps AS (SELECT {id_col} AS id, {fp} AS simhash FROM {table})
        SELECT l.id AS a, r.id AS b,
               bit_count(xor(l.simhash, r.simhash)) AS hamming
        FROM fps l JOIN fps r ON l.id < r.id
        WHERE bit_count(xor(l.simhash, r.simhash)) <= {radius}
    """
