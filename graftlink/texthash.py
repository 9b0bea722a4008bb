"""Portable text hashing — identical arithmetic in Spark and DuckDB.

Every dedup/fingerprint operator in this engine is *oracle-checkable*:
the driver runs the Spark query and a DuckDB SQL twin and compares
value hashes, so the hash functions themselves must produce identical
int64 results in both engines. That rules out engine-native hashes
(Spark xxhash64/murmur vs DuckDB's murmur variant disagree), so the
portable spec is a polynomial rolling hash over unicode code points:

    H(s) = fold(c in s, acc=7): (acc * 31 + codepoint(c)) mod 1_000_000_007

computed with JVM-side higher-order functions (`aggregate` over
`split(s,'')` + `ascii`) in Spark and `list_reduce` in DuckDB —
verified byte-for-byte equal cross-engine, including unicode.

Scale note (100 TB): the portable hash is whole-stage-codegen'd JVM
arithmetic, but it is O(chars) per call with per-char function-call
overhead. The dedup operators therefore accept `hash_mode="fast"`
which swaps in `xxhash64` (single native call per string, same
downstream algebra) for production runs where a DuckDB twin is not
needed; all pytest parity suites run both modes.

Shingling follows the standard MinHash recipe (Broder 1997): w-token
word shingles over lowercased whitespace tokens, hashed then
deduplicated into a set per document.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRIME = 1_000_000_007
HASH_SEED = 7
TOKEN_SPLIT_RE = r"\s+"

# MinHash permutation constants: h_i(x) = (A[i]*x + B[i]) % PRIME.
# Derived from the Knuth multiplicative constant; precomputed so the
# Spark expressions and the generated SQL embed identical literals.
MINHASH_K = 16


def _perm_consts(k: int = MINHASH_K) -> list[tuple[int, int]]:
    return [
        ((2654435761 * (i + 1)) % PRIME, (40503 * (i + 1) + 13) % PRIME)
        for i in range(k)
    ]


# ---------------------------------------------------------------------------
# Spark column expressions
# ---------------------------------------------------------------------------


def poly_hash(col: Column) -> Column:
    """Portable string hash (int64), JVM-side fold over characters."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(HASH_SEED).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % PRIME,
    )


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped -> array<string>."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def token_hashes(col: Column, hash_mode: str = "portable") -> Column:
    """array<long> — one hash per token (duplicates kept: frequency
    matters for SimHash votes)."""
    hfn = poly_hash if hash_mode == "portable" else _fast_hash
    return F.transform(tokens(col), hfn)


def _fast_hash(col: Column) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(PRIME))


def window_hashes(col: Column, w: int, hash_mode: str = "portable") -> Column:
    """POSITIONAL w-token sliding-window hashes -> array<long>, one
    entry per start position (shingle_hashes minus the distinct: span
    coverage needs every position counted). Same short/empty-doc
    conventions as shingle_hashes."""
    hfn = poly_hash if hash_mode == "portable" else _fast_hash
    toks = tokens(col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - w + 1, F.lit(1)))
    return F.transform(
        starts, lambda i: hfn(F.concat_ws(" ", F.slice(toks, i, w)))
    )


def shingle_hashes(col: Column, w: int = 3, hash_mode: str = "portable") -> Column:
    """Distinct hashed w-token shingles -> array<long> (the MinHash
    input set). Documents shorter than w tokens contribute their whole
    token sequence as a single shingle; empty documents contribute the
    single hash of '' (same value both engines).
    """
    hfn = poly_hash if hash_mode == "portable" else _fast_hash
    toks = tokens(col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - w + 1, F.lit(1)))
    return F.array_distinct(
        F.transform(
            starts,
            lambda i: hfn(F.concat_ws(" ", F.slice(toks, i, w))),
        )
    )


def minhash_signature(shingles: Column, k: int = MINHASH_K) -> Column:
    """array<long> length-k MinHash signature of a shingle-hash set.

    Empty shingle sets yield [PRIME]*k (a sentinel no real hash
    reaches), keeping the column non-null and such docs in their own
    LSH bucket family.
    """
    def perm(a: int, b: int):
        # closure factory, not default args: Spark reads lambda arity
        # from the full signature, so extra bound params would be
        # mistaken for higher-order-function variables
        return lambda s: (s * a + b) % PRIME

    sig = [
        F.coalesce(
            F.array_min(F.transform(shingles, perm(a, b))),
            F.lit(PRIME).cast("long"),
        )
        for a, b in _perm_consts(k)
    ]
    return F.array(*sig)


def simhash(col: Column, bits: int = 24, hash_mode: str = "portable") -> Column:
    """SimHash (Charikar 2002) over token hashes, `bits` wide.

    bit b of the output is 1 iff sum over tokens of (2*((h>>b)&1)-1)
    is positive. 24 bits (not 64) because the portable hash has ~30
    bits of entropy; 24 splits into three 8-bit bands for the exact
    hamming-LSH in dedup.simhash_near_dups.
    """
    th = token_hashes(col, hash_mode)

    def bit_vote(b: int):
        # bit test ((h>>b)&1) as mod/compare arithmetic — h is always
        # non-negative; closure factory for the same arity reason as in
        # minhash_signature
        hi, lo = F.lit(1 << (b + 1)), F.lit(1 << b)
        return lambda acc, h: acc + F.when((h % hi) >= lo, F.lit(1)).otherwise(F.lit(-1))

    parts = []
    for b in range(bits):
        vote = F.aggregate(th, F.lit(0).cast("long"), bit_vote(b))
        parts.append(F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long"))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


# ---------------------------------------------------------------------------
# DuckDB SQL twins (generated with the same literals)
# ---------------------------------------------------------------------------


def poly_hash_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST({HASH_SEED} AS BIGINT), "
        f"[CAST(ascii(c) AS BIGINT) for c in string_split({expr}, '')]), "
        f"(acc, x) -> (acc*31 + x) % {PRIME})"
    )


def tokens_sql(expr: str) -> str:
    return rf"list_filter(string_split_regex(lower({expr}), '\s+'), t -> t != '')"


def shingle_hashes_sql(expr: str, w: int = 3) -> str:
    """DuckDB twin of shingle_hashes (portable mode)."""
    # coalesce: DuckDB array_to_string([]) is NULL, Spark concat_ws is ''
    shingle = poly_hash_sql(f"coalesce(array_to_string(toks[i : i + {w - 1}], ' '), '')")
    return (
        f"(SELECT list_distinct([{shingle} "
        f"  for i in range(1, greatest(len(toks) - {w} + 1, 1) + 1)]) "
        f" FROM (SELECT {tokens_sql(expr)} AS toks))"
    )


def window_hashes_sql(expr: str, w: int) -> str:
    """DuckDB twin of window_hashes (portable mode)."""
    shingle = poly_hash_sql(
        f"coalesce(array_to_string(toks[i : i + {w - 1}], ' '), '')"
    )
    return (
        f"(SELECT [{shingle} "
        f"  for i in range(1, greatest(len(toks) - {w} + 1, 1) + 1)] "
        f" FROM (SELECT {tokens_sql(expr)} AS toks))"
    )


def minhash_signature_sql(shingles_expr: str, k: int = MINHASH_K) -> str:
    mins = ", ".join(
        f"coalesce(list_min([(s * {a} + {b}) % {PRIME} for s in sh]), {PRIME})"
        for a, b in _perm_consts(k)
    )
    return f"(SELECT [{mins}] FROM (SELECT {shingles_expr} AS sh))"


def simhash_sql(expr: str, bits: int = 24) -> str:
    terms = " + ".join(
        f"(CASE WHEN list_sum([((h >> {b}) & 1)*2 - 1 for h in th]) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    th = f"[{poly_hash_sql('t')} for t in {tokens_sql(expr)}]"
    return f"(SELECT {terms} FROM (SELECT {th} AS th))"
