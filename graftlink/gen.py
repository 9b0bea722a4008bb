"""Deterministic synthetic corpus + graph generators (FIXTURES.md F1/F2).

Everything is seed-fixed and wall-clock-free; generation is
distributed (spark.range -> mapInArrow with numpy splitmix64 hashing)
so the same generator that feeds unit tests can emit the 10^6-10^7
edge bench graphs without driver-side materialization — and would
scale to the 10^9-edge design point on a real cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from graftlink.extract import extract_text

# ---------------------------------------------------------------------------
# splitmix64: deterministic stateless hash -> uniform uint64 (public domain
# algorithm, Steele et al.; vectorized in numpy)
# ---------------------------------------------------------------------------

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + _U64(0x9E3779B97F4A7C15)) & _U64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _U64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _U64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> _U64(31))


def _uniform01(x: np.ndarray) -> np.ndarray:
    return splitmix64(x).astype(np.float64) / float(2**64)


# ---------------------------------------------------------------------------
# Direct edge-table generator (F2 bench family): power-law in-degree
# ---------------------------------------------------------------------------


def synthetic_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    skew: float = 2.5,
    partitions: int | None = None,
) -> DataFrame:
    """DF[src long, dst long]: src ~ uniform, dst ~ power-law (low ids
    are hubs — max hub collects a constant fraction of edges, the E13
    skew scenario). Deterministic in (n_vertices, n_edges, seed)."""
    # wraparound multiply done in Python ints to avoid numpy overflow warnings
    mix = _U64((seed * 0x9E3779B97F4A7C15) % (1 << 64))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            idx = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
            src = (splitmix64(idx * _U64(2) + mix) % _U64(n_vertices)).astype(np.int64)
            u = _uniform01(idx * _U64(2) + _U64(1) + mix)
            dst = np.minimum(
                (n_vertices * np.power(u, skew)).astype(np.int64), n_vertices - 1
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(src, pa.int64()), pa.array(dst, pa.int64())],
                ["src", "dst"],
            )

    rng = spark.range(n_edges, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInArrow(kernel, "src long, dst long")


# ---------------------------------------------------------------------------
# Pages-corpus generator (F1): url/warc_ts/html/text/lang
# ---------------------------------------------------------------------------

_LANGS = ["en"] * 18 + ["de", "fr"]
_WORDS = (
    "spark graph rank link crawl page web data node edge query table "
    "shuffle batch vector arrow bucket label count iter"
).split()


def _host_of(i: int, n_hosts: int) -> int:
    # Zipf-ish host popularity: squared uniform concentrates on low ids
    u = float(splitmix64(np.array([i * 7 + 13], dtype=np.uint64))[0]) / 2**64
    return int(n_hosts * u * u) % n_hosts


def url_of(i: int, n_hosts: int) -> str:
    return f"https://host{_host_of(i, n_hosts)}.example/p{i}"


def link_targets(i: int, n_pages: int, n_hosts: int, seed: int) -> list[int]:
    """Deterministic outlink target indices for page i: 1..8 links,
    ~2% point past n_pages (dangling targets with no page row)."""
    h = splitmix64(np.arange(i * 16 + seed, i * 16 + seed + 16, dtype=np.uint64))
    k = 1 + int(h[0] % 8)
    out = []
    for j in range(k):
        r = int(h[j + 1])
        if r % 50 == 0:  # dangling: target url with no page
            out.append(n_pages + (r % 97))
        else:
            out.append(r % n_pages)
    return out


def page_html(i: int, n_pages: int, n_hosts: int, seed: int) -> bytes:
    h = int(splitmix64(np.array([i + seed], dtype=np.uint64))[0])
    words = " ".join(_WORDS[(h >> (4 * j)) % len(_WORDS)] for j in range(8))
    links = "".join(
        f'<a href="{url_of(t, n_hosts)}">t{t}</a> '
        for t in link_targets(i, n_pages, n_hosts, seed)
    )
    body = f"<html><head><title>Page {i}</title><script>var x=1;</script></head>" \
           f"<body><h1>p{i}</h1><p>{words} &amp; more</p>{links}</body></html>"
    raw = body.encode("utf-8")
    if i % 37 == 0:  # BOM + CRLF subset pins byte-parity edge cases
        raw = b"\xef\xbb\xbf" + raw.replace(b"<p>", b"\r\n<p>")
    return raw


def synthetic_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int | None = None,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed pages table exactly matching the input_hint schema.
    ~1% of urls get a second, later snapshot (exercises E19 dedup);
    `text` is EXACTLY extract_text(html) (BASELINE.json:15 invariant)."""
    n_hosts = n_hosts or max(4, n_pages // 50)
    base_ts = np.datetime64("2026-01-01T00:00:00")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            idx = batch.column("id").to_numpy(zero_copy_only=False)
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for i in idx:
                i = int(i)
                h = int(splitmix64(np.array([i * 3 + 1 + seed], dtype=np.uint64))[0])
                snapshots = [(0, i)]
                if i % 100 == 0:  # duplicate snapshot a day later
                    snapshots.append((86400, i + 1_000_003))
                for extra_s, variant in snapshots:
                    raw = page_html(variant if extra_s else i, n_pages, n_hosts, seed)
                    urls.append(url_of(i, n_hosts))
                    tss.append(base_ts + np.timedelta64(h % 10**6 + extra_s, "s"))
                    htmls.append(raw)
                    texts.append(extract_text(raw))
                    langs.append(_LANGS[h % 20])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(np.array(tss, dtype="datetime64[us]")),
                    pa.array(htmls, pa.binary()),
                    pa.array(texts, pa.string()),
                    pa.array(langs, pa.string()),
                ],
                ["url", "warc_ts", "html", "text", "lang"],
            )

    rng = spark.range(
        n_pages, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    return rng.mapInArrow(
        kernel, "url string, warc_ts timestamp, html binary, text string, lang string"
    )

# ---------------------------------------------------------------------------
# igraph deterministic constructors (igraph_ring/star/full/kary_tree/
# square_lattice surface — igraph@0.10.x src/constructors/ [unverified
# split]). All are pure spark.range + column expressions: distributed,
# seed-free, O(edges) with no driver materialization. Barabási is
# deliberately absent: preferential attachment is sequential-RNG by
# definition; the power-law bench family (synthetic_edges) is the
# deterministic stand-in for heavy-tail degree shape.
# ---------------------------------------------------------------------------

from pyspark.sql import functions as _F


def ring_graph(spark: SparkSession, n: int, directed: bool = False) -> DataFrame:
    """Cycle 0-1-...-(n-1)-0 (igraph_ring, circular=True)."""
    e = spark.range(n).select(
        _F.col("id").alias("src"), ((_F.col("id") + 1) % n).alias("dst")
    )
    if directed:
        return e
    return e.unionAll(e.select(_F.col("dst").alias("src"), _F.col("src").alias("dst")))


def star_graph(spark: SparkSession, n: int, mode: str = "out") -> DataFrame:
    """Center 0 to/from spokes 1..n-1 (igraph_star)."""
    spokes = spark.range(1, n)
    if mode == "out":
        return spokes.select(_F.lit(0).alias("src"), _F.col("id").alias("dst"))
    if mode == "in":
        return spokes.select(_F.col("id").alias("src"), _F.lit(0).alias("dst"))
    out = spokes.select(_F.lit(0).alias("src"), _F.col("id").alias("dst"))
    return out.unionAll(
        spokes.select(_F.col("id").alias("src"), _F.lit(0).alias("dst"))
    )


def full_graph(spark: SparkSession, n: int, directed: bool = False) -> DataFrame:
    """Complete graph, no loops (igraph_full). O(n²) edges BY
    DEFINITION — a fixture constructor, not a web-scale object."""
    a = spark.range(n).select(_F.col("id").alias("src"))
    b = spark.range(n).select(_F.col("id").alias("dst"))
    e = a.crossJoin(b)
    cond = (
        _F.col("src") != _F.col("dst")
        if directed
        else _F.col("src") < _F.col("dst")
    )
    return e.where(cond)


def kary_tree(spark: SparkSession, n: int, k: int = 2, mode: str = "out") -> DataFrame:
    """k-ary tree on n vertices, parent->child edges for mode='out'
    (igraph_kary_tree): vertex i>0 has parent (i-1)//k."""
    kids = spark.range(1, n).select(
        _F.floor((_F.col("id") - 1) / k).cast("long").alias("parent"),
        _F.col("id").alias("child"),
    )
    if mode == "out":
        return kids.select(
            _F.col("parent").alias("src"), _F.col("child").alias("dst")
        )
    return kids.select(_F.col("child").alias("src"), _F.col("parent").alias("dst"))


def square_lattice(
    spark: SparkSession, rows: int, cols: int, directed: bool = False
) -> DataFrame:
    """rows×cols grid, vertex id = r*cols + c, right+down neighbor
    edges (igraph_square_lattice, non-circular)."""
    cells = spark.range(rows * cols).select(
        _F.col("id"),
        _F.floor(_F.col("id") / cols).alias("_r"),
        (_F.col("id") % cols).alias("_c"),
    )
    right = cells.where(_F.col("_c") < cols - 1).select(
        _F.col("id").alias("src"), (_F.col("id") + 1).alias("dst")
    )
    down = cells.where(_F.col("_r") < rows - 1).select(
        _F.col("id").alias("src"), (_F.col("id") + cols).alias("dst")
    )
    e = right.unionAll(down)
    if directed:
        return e
    return e.unionAll(e.select(_F.col("dst").alias("src"), _F.col("src").alias("dst")))


def watts_strogatz(
    spark: SparkSession,
    n: int,
    k: int = 2,
    p_num: int = 1,
    p_den: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Deterministic seeded Watts-Strogatz small world (igraph
    watts_strogatz_game(dim=1, size=n, nei=k) with the RNG swapped for
    the engine's portable mod-P poly-hash, the rewire_edges
    convention): ring lattice i -> (i+j) % n for j = 1..k; each
    lattice edge rewires its FAR endpoint to H2 mod n with probability
    p = p_num/p_den, decided by the exact integer compare
    H1 * p_den < p_num * P (no float thresholds, identical arithmetic
    in the DuckDB twin). Where igraph redraws a colliding target in a
    loop, the deterministic single-draw keeps the lattice endpoint
    when the draw lands on the source (self-loop) — documented
    deviation; parallel edges stay possible exactly as with igraph's
    multiple=True. Out-degree is k for every vertex by construction.
    Pure codegen over spark.range — no shuffle, no Python."""
    from graftlink.rewire import _h

    base = spark.range(n).select(
        _F.col("id").alias("src"),
        _F.explode(_F.sequence(_F.lit(1), _F.lit(int(k)))).alias("_j"),
    )
    lat = (_F.col("src") + _F.col("_j")) % n
    h1 = _h(_F.col("src"), lat, 0, seed)
    h2 = _h(_F.col("src"), lat, 1, seed) % n
    rewire = (h1 * _F.lit(int(p_den)) < _F.lit(int(p_num) * 1_000_000_007)) & (
        h2 != _F.col("src")
    )
    return base.select(
        "src", _F.when(rewire, h2).otherwise(lat).cast("long").alias("dst")
    )


def watts_strogatz_sql(
    n: int, k: int = 2, p_num: int = 1, p_den: int = 10, seed: int = 42
) -> str:
    """Self-contained DuckDB twin of watts_strogatz (same poly-hash
    arithmetic, same integer probability compare, no input tables)."""
    P, A1, A2, A3, A4, C = (
        1_000_000_007,
        2_654_435_761 % 1_000_000_007,
        40_503,
        69_069,
        1_103_515_245,
        12_345,
    )
    # rnd/seed terms pre-folded in Python: DuckDB literals are INT32
    # and (seed % P) * A1 overflows them; src/j-derived terms ride on
    # range()'s BIGINT so the remaining arithmetic is 64-bit in both
    # engines.
    c0 = (0 % P) * A2 + (seed % P) * A1 + C
    c1 = (1 % P) * A2 + (seed % P) * A1 + C
    hh = f"((src % {P}) * {A3} + (((src + j) % {n}) % {P}) * {A4} + CONST) % {P}"
    return f"""
        WITH base AS (
            SELECT t.range AS src, s.range AS j
            FROM range({n}) t, range(1, {k} + 1) s
        ),
        hashed AS (
            SELECT src, j,
                   {hh.replace("CONST", str(c0))} AS h1,
                   ({hh.replace("CONST", str(c1))}) % {n} AS h2
            FROM base
        )
        SELECT CAST(src AS BIGINT) AS src,
               CAST(
                   CASE WHEN h1 * {p_den} < {p_num * P} AND h2 <> src
                        THEN h2 ELSE (src + j) % {n} END
               AS BIGINT) AS dst
        FROM hashed
    """
