"""Deterministic hash sampling and train/val/test splits.

Training-pipeline layer: at 10^12 documents you cannot `df.sample()`
(nondeterministic across retries/partitionings — a resumed job would
sample a DIFFERENT subset) and you cannot persist a membership table
(a second 100 TB-scale artifact to keep consistent). The standard
recipe is content-keyed hash bucketing: a pure function of a stable
key decides membership, so the sample/split is reproducible across
runs, engines, partitionings, and resumes, and any two pipelines
hashing the same key agree on the split (no train/test leakage when
datasets are re-joined later).

Portable hash (oracle-checkable — identical arithmetic in DuckDB):

    m = k mod P;  H(k, seed) = (m*m mod P * A1 + m*A2 + seed*A3 + C) mod P

with P = 1e9+7. The quadratic term breaks the arithmetic-progression
structure an affine map would leave in dense id spaces; every
intermediate stays below int64 overflow under ANSI mode (m < P so
m*m < ~1e18, then re-reduced before the A1 multiply). Production mode
(`hash_mode="fast"`) swaps in `xxhash64(key, seed)` — one native call,
same downstream algebra — when no DuckDB twin is needed (same
fast/portable split as graftlink.texthash).

Everything is a single whole-stage-codegen'd filter/projection: no
shuffle, no UDF, predicate sits directly on the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 1_000_000_007
A1, A2, A3, C = 2_654_435_761 % P, 1_103_515_245, 69_069, 1_013_904_223 % P
DENOM = 1_000_000  # bucket resolution: rates quantized to 1e-6


def _bucket_col(key: Column, seed: int, hash_mode: str) -> Column:
    """[0, DENOM) bucket for an integer key column."""
    if hash_mode == "fast":
        return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(DENOM))
    m = F.pmod(key, F.lit(P))
    h = F.pmod(
        F.pmod(m * m, F.lit(P)) * F.lit(A1)
        + m * F.lit(A2)
        + F.lit(seed * A3 % P)
        + F.lit(C),
        F.lit(P),
    )
    return F.pmod(h, F.lit(DENOM))


def _bucket_sql(key: str, seed: int) -> str:
    """DuckDB twin of the portable bucket (keys are non-negative)."""
    m = f"({key} % {P})"
    h = f"(({m} * {m} % {P}) * {A1} + {m} * {A2} + {seed * A3 % P} + {C}) % {P}"
    return f"(({h}) % {DENOM})"


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    seed: int = 1,
    hash_mode: str = "portable",
) -> DataFrame:
    """Keep each row iff bucket(key) < rate * DENOM — a deterministic
    ~rate-fraction sample, stable under retries and re-partitioning."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(round(rate * DENOM))
    return df.where(_bucket_col(F.col(key_col), seed, hash_mode) < F.lit(cut))


def hash_sample_sql(source_sql: str, key_col: str, rate: float, seed: int = 1) -> str:
    cut = int(round(rate * DENOM))
    return f"""
        SELECT * FROM ({source_sql})
        WHERE {_bucket_sql(key_col, seed)} < {cut}
    """


def assign_splits(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 1,
    hash_mode: str = "portable",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label column; weights are consumed in
    dict order as cumulative bucket ranges (so the same weights dict
    always yields the same partition of the key space)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    b = _bucket_col(F.col(key_col), seed, hash_mode)
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        cut = int(round(acc * DENOM))
        expr = (
            F.when(b < F.lit(cut), F.lit(name))
            if expr is None
            else expr.when(b < F.lit(cut), F.lit(name))
        )
    # float-rounding guard: the final cumulative cut is exactly DENOM,
    # so otherwise() is unreachable; kept for schema totality
    return df.withColumn(out_col, expr.otherwise(F.lit(list(weights)[-1])))


def assign_splits_sql(
    source_sql: str,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 1,
    out_col: str = "split",
) -> str:
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    b = _bucket_sql(key_col, seed)
    cases = []
    acc = 0.0
    for name, w in weights.items():
        acc += w
        cases.append(f"WHEN {b} < {int(round(acc * DENOM))} THEN '{name}'")
    last = list(weights)[-1]
    return f"""
        SELECT *, CASE {' '.join(cases)} ELSE '{last}' END AS {out_col}
        FROM ({source_sql})
    """


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 1,
    hash_mode: str = "portable",
) -> DataFrame:
    """Deterministic per-stratum hash sample — the curation move
    "keep 100% of wiki, 10% of common-crawl, 50% of code": each
    stratum value gets its own keep-rate; unlisted strata fall back to
    `default_rate`. Same bucket algebra as hash_sample, so membership
    is a pure function of (key, seed) and the plan stays ONE
    whole-stage-codegen'd filter on the scan — the per-stratum cut is
    a CASE on `strata_col`, never a join against a rates table (a
    broadcast join would also work at 100 TB, but a literal CASE of a
    few dozen strata folds into the scan predicate and keeps the
    sample decidable row-locally, partition pruning intact).

    Spark's own `sampleBy` is the API shape being matched; it is
    RNG-seeded per task and NOT stable across retries/partitionings,
    which is disqualifying for resumable 100 TB curation jobs.
    """
    for name, rate in fractions.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    cut = F.lit(int(round(default_rate * DENOM)))
    for name, rate in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col) == F.lit(name), F.lit(int(round(rate * DENOM)))
        ).otherwise(cut)
    return df.where(_bucket_col(F.col(key_col), seed, hash_mode) < cut)


def stratified_sample_sql(
    source_sql: str,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 1,
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{name}' THEN {int(round(rate * DENOM))}"
        for name, rate in sorted(fractions.items())
    )
    return f"""
        SELECT * FROM ({source_sql})
        WHERE {_bucket_sql(key_col, seed)}
            < CASE {cases} ELSE {int(round(default_rate * DENOM))} END
    """
