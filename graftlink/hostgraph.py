"""Host- and domain-level web-graph rollups (cc-webgraph parity).

Alongside the page-level graph, the Common Crawl project publishes
host- and domain-level webgraphs with per-host centralities (the
`cc-webgraph` releases; igraph-style analytics are run on the rolled
-up graph, not the page graph). The rollup is a vertex contraction
by the url's host (then by registrable domain): every page-level
edge (src_url, dst_url) becomes (host(src_url), host(dst_url)) with
weight = number of page links between the two hosts, intra-host
links dropped (they are navigation, not endorsement), and the
iterative algorithms run on the contracted graph whose vertex count
is ~1e8 where the page graph is ~1e12 — the standard trick that
makes global centralities tractable at crawl scale.

Scale shape:
- host extraction is a pure JVM column expression (regexp inside
  whole-stage codegen) — no Python in the hot path, no shuffle;
- the contraction is ONE partial+final hash aggregation keyed on
  (src_host, dst_host) — the partial agg collapses the (heavily
  repeated) host pairs map-side before the exchange, so the shuffle
  carries the ~1e9-row host-pair table, never the ~1e12-row page
  edges, and page urls/text never move;
- the host dictionary (host -> dense long id) is the two-pass
  range-partitioned rank (`vertices.dense_rank_ids`) — two narrow
  passes over the distinct hosts only;
- downstream supersteps (PageRank etc.) then run on a graph 4-5
  orders of magnitude smaller than the input, reusing the engine's
  weighted kernels unchanged.

Registered-domain note: the real registrable-domain boundary is the
Mozilla Public Suffix List — a data file, not an algorithm. This
module uses the documented simplification "last two dot-labels"
(`site7.org` for `h12.site7.org`); swapping in a PSL lookup is a
broadcast-join against the suffix table and changes no plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graftlink.docs_graph import KNUTH, clean_edges, doc_edges
from graftlink.vertices import dense_rank_ids

# host = authority minus userinfo/port; scheme required (normalize_url
# guarantees http/https). Same RE2/Java-regex-compatible pattern is
# used verbatim in the DuckDB twins below.
HOST_RE = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]+@)?([^/?#:]+)"
DOMAIN_RE = "([^.]+[.][^.]+)$"


def host_expr(url: Column | str) -> Column:
    """Lowercased host of a normalized url (pure JVM expression)."""
    col = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(col, HOST_RE, 1))


def domain_expr(host: Column | str) -> Column:
    """Registrable domain of a host — documented last-two-labels
    simplification (module docstring)."""
    col = F.col(host) if isinstance(host, str) else host
    return F.regexp_extract(col, DOMAIN_RE, 1)


def host_edges(
    url_edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    keep_intra: bool = False,
) -> DataFrame:
    """DF[src_host, dst_host, weight] — the host-level rollup.

    weight = count of page-level links between the host pair;
    intra-host links dropped unless keep_intra (docstring rationale).
    """
    he = url_edges.select(
        host_expr(src_col).alias("src_host"), host_expr(dst_col).alias("dst_host")
    )
    if not keep_intra:
        he = he.where(F.col("src_host") != F.col("dst_host"))
    return he.groupBy("src_host", "dst_host").agg(F.count("*").alias("weight"))


def domain_edges(
    url_edges: DataFrame, src_col: str = "src_url", dst_col: str = "dst_url"
) -> DataFrame:
    """DF[src_domain, dst_domain, weight] — domain-level rollup
    (cc-webgraph's second product); intra-domain links dropped."""
    de = url_edges.select(
        domain_expr(host_expr(src_col)).alias("src_domain"),
        domain_expr(host_expr(dst_col)).alias("dst_domain"),
    ).where(F.col("src_domain") != F.col("dst_domain"))
    return de.groupBy("src_domain", "dst_domain").agg(F.count("*").alias("weight"))


def _rollup_for_rank(
    url_edges: DataFrame, level: str, src_col: str, dst_col: str
) -> DataFrame:
    """DF[src_host, dst_host, weight] at the requested contraction
    level — domain rollup renamed into the host-column contract so
    the shared rank pipeline (dictionary + kernel) is level-blind."""
    if level == "domain":
        de = domain_edges(url_edges, src_col, dst_col)
        return de.select(
            F.col("src_domain").alias("src_host"),
            F.col("dst_domain").alias("dst_host"),
            "weight",
        )
    if level != "host":
        raise ValueError(f"level must be 'host' or 'domain', got {level!r}")
    return host_edges(url_edges, src_col, dst_col)


def host_link_stats(
    url_edges: DataFrame, src_col: str = "src_url", dst_col: str = "dst_url"
) -> DataFrame:
    """Per-host outbound profile over page-level links:
    DF[host, out_links, intra_links, intra_frac, dst_hosts].

    intra_frac (share of links staying on-host) is the classic
    crawl-frontier signal separating navigation-heavy sites from
    hub sites; dst_hosts is the host's out-fan in the host graph.
    One partial+final hash agg on host; distinct-dst counted via the
    standard Spark expand (null intra targets ignored by
    count(DISTINCT)).
    """
    s = host_expr(src_col)
    d = host_expr(dst_col)
    return (
        url_edges.select(
            s.alias("host"),
            (s == d).alias("intra"),
            F.when(s != d, d).alias("ext_dst"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("out_links"),
            F.sum(F.col("intra").cast("long")).alias("intra_links"),
            F.round(
                F.sum(F.col("intra").cast("double")) / F.count("*"), 6
            ).alias("intra_frac"),
            F.countDistinct("ext_dst").alias("dst_hosts"),
        )
    )


def host_pagerank(
    url_edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    level: str = "host",
    **pr_kw,
) -> DataFrame:
    """DF[host, rank] — weighted PageRank on the host rollup, the
    headline cc-webgraph centrality. `level="domain"` contracts by
    registrable domain instead (domain_expr over host_expr) so the
    ranked entities match the rollup level — the host column then
    holds domains (round-4 advisor finding).

    Pipeline: rollup (one agg) -> host dictionary (two-pass dense
    rank) -> the engine's weighted PageRank kernel on dense long ids
    -> decode back to host names. The two dictionary joins are
    broadcast-able (the host table is tiny next to the edge table);
    the iterative work never sees a string.
    """
    he = _rollup_for_rank(url_edges, level, src_col, dst_col)
    hosts = dense_rank_ids(
        he.select(F.col("src_host").alias("host")).unionAll(
            he.select(F.col("dst_host").alias("host"))
        ),
        "host",
    )
    enc = (
        he.join(F.broadcast(hosts.withColumnRenamed("host", "src_host")), "src_host")
        .withColumnRenamed("id", "src")
        .join(
            F.broadcast(
                hosts.select(
                    F.col("id").alias("dst"), F.col("host").alias("dst_host")
                )
            ),
            "dst_host",
        )
        .select("src", "dst", F.col("weight").cast("double").alias("weight"))
    )
    from graftlink.pagerank import pagerank

    ranks = pagerank(
        enc,
        vertices=hosts.select("id"),
        damping=damping,
        max_iter=max_iter,
        tol=tol,
        weight_col="weight",
        **pr_kw,
    )
    return ranks.join(F.broadcast(hosts), "id").select("host", "rank")


# ---------------------------------------------------------------------------
# Driver fixture: deterministic urls over the `documents` stand-in
# (FIXTURES.md F1). host_id = floor(sqrt(u)), u = (doc_id*KNUTH) mod
# 1e4 uniform, giving hosts 0..99 with linearly-skewed sizes (host h
# holds ~(2h+1)/1e4 of docs — a 1:199 size spread standing in for
# crawl host skew). Hosts share registrable domains via hid % 23; a
# third of hosts are apex (www-less) domains. All of it is closed-form
# int64/double arithmetic expressible identically in DuckDB.
# ---------------------------------------------------------------------------

HOST_BUCKETS = 10_000
DOMAIN_MOD = 23


def _fixture_url(doc: Column) -> Column:
    hid = F.floor(F.sqrt(F.pmod(doc * F.lit(KNUTH), F.lit(HOST_BUCKETS))))
    dom = F.concat(F.lit("site"), (hid % DOMAIN_MOD).cast("string"), F.lit(".org"))
    host = F.when(hid % 3 == 0, dom).otherwise(
        F.concat(F.lit("h"), hid.cast("string"), F.lit("."), dom)
    )
    return F.concat(F.lit("https://"), host, F.lit("/d/"), doc.cast("string"))


def doc_url_edges(spark, sf_dir: str) -> DataFrame:
    """DF[src_url, dst_url] — the stand-in page-level link table."""
    e = clean_edges(doc_edges(spark, sf_dir))
    return e.select(
        _fixture_url(F.col("src")).alias("src_url"),
        _fixture_url(F.col("dst")).alias("dst_url"),
    )


def _fixture_url_sql(doc: str) -> str:
    hid = f"CAST(floor(sqrt(({doc} * {KNUTH}) % {HOST_BUCKETS})) AS BIGINT)"
    dom = f"'site' || CAST({hid} % {DOMAIN_MOD} AS VARCHAR) || '.org'"
    host = (
        f"CASE WHEN {hid} % 3 = 0 THEN {dom} "
        f"ELSE 'h' || CAST({hid} AS VARCHAR) || '.' || {dom} END"
    )
    return f"'https://' || {host} || '/d/' || CAST({doc} AS VARCHAR)"


def doc_url_edges_sql(clean: str) -> str:
    """DuckDB twin of doc_url_edges over a `clean(src,dst)` CTE body."""
    return f"""
        SELECT {_fixture_url_sql('c.src')} AS src_url,
               {_fixture_url_sql('c.dst')} AS dst_url
        FROM ({clean}) c
    """


_HOST_FROM_URL = (
    "lower(regexp_extract({u}, '" + HOST_RE + "', 1))"
)
_DOMAIN_FROM_HOST = "regexp_extract({h}, '" + DOMAIN_RE.replace("[.]", "\\.") + "', 1)"


def host_edges_sql(urledges: str) -> str:
    return f"""
        SELECT src_host, dst_host, count(*) AS weight
        FROM (
            SELECT {_HOST_FROM_URL.format(u='src_url')} AS src_host,
                   {_HOST_FROM_URL.format(u='dst_url')} AS dst_host
            FROM ({urledges})
        )
        WHERE src_host <> dst_host
        GROUP BY src_host, dst_host
    """


def domain_edges_sql(urledges: str) -> str:
    sh = _HOST_FROM_URL.format(u="src_url")
    dh = _HOST_FROM_URL.format(u="dst_url")
    return f"""
        SELECT src_domain, dst_domain, count(*) AS weight
        FROM (
            SELECT {_DOMAIN_FROM_HOST.format(h=sh)} AS src_domain,
                   {_DOMAIN_FROM_HOST.format(h=dh)} AS dst_domain
            FROM ({urledges})
        )
        WHERE src_domain <> dst_domain
        GROUP BY src_domain, dst_domain
    """


def host_link_stats_sql(urledges: str) -> str:
    return f"""
        SELECT src_host AS host,
               count(*) AS out_links,
               CAST(sum(CASE WHEN src_host = dst_host THEN 1 ELSE 0 END)
                    AS BIGINT) AS intra_links,
               round(sum(CASE WHEN src_host = dst_host THEN 1.0 ELSE 0.0 END)
                     / count(*), 6) AS intra_frac,
               count(DISTINCT CASE WHEN src_host <> dst_host
                              THEN dst_host END) AS dst_hosts
        FROM (
            SELECT {_HOST_FROM_URL.format(u='src_url')} AS src_host,
                   {_HOST_FROM_URL.format(u='dst_url')} AS dst_host
            FROM ({urledges})
        )
        GROUP BY src_host
    """


def host_pagerank_sql(
    urledges: str, iters: int = 20, d: float = 0.85, top: int = 10
) -> str:
    """Bounded-round weighted power iteration over the host rollup —
    mirrors the engine's weighted kernel (per-src weight
    normalization, dangling mass redistributed uniformly)."""
    return f"""
        WITH RECURSIVE
        hedges AS ({host_edges_sql(urledges)}),
        verts AS (
            SELECT DISTINCT host FROM (
                SELECT src_host AS host FROM hedges
                UNION ALL SELECT dst_host FROM hedges
            )
        ),
        nv AS (SELECT count(*) AS n FROM verts),
        wsum AS (
            SELECT src_host, sum(CAST(weight AS DOUBLE)) AS ws
            FROM hedges GROUP BY src_host
        ),
        state(round, host, rank) AS (
            SELECT 0, host, 1.0 / (SELECT n FROM nv) FROM verts
            UNION ALL
            SELECT r.round + 1, r.host,
                   (1.0 - {d}) / (SELECT n FROM nv)
                   + {d} * (coalesce(pl.pull, 0.0) + dgl.dm / (SELECT n FROM nv))
            FROM state r
            LEFT JOIN (
                SELECT e.dst_host AS host,
                       sum(st.rank * (CAST(e.weight AS DOUBLE) / ws.ws)) AS pull
                FROM state st
                JOIN wsum ws ON ws.src_host = st.host
                JOIN hedges e ON e.src_host = st.host
                GROUP BY e.dst_host
            ) pl ON pl.host = r.host
            CROSS JOIN (
                SELECT coalesce(sum(st.rank)
                                FILTER (WHERE ws.src_host IS NULL), 0.0) AS dm
                FROM state st LEFT JOIN wsum ws ON ws.src_host = st.host
            ) dgl
            WHERE r.round < {iters}
        )
        SELECT host, round(rank, 6) AS rank FROM state WHERE round = {iters}
        ORDER BY rank DESC, host ASC LIMIT {top}
    """


def host_harmonic(
    url_edges: DataFrame,
    normalized: bool = False,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    level: str = "host",
) -> DataFrame:
    """DF[host, harmonic] — harmonic centrality of the host graph,
    the OTHER headline cc-webgraph rank (their releases publish
    harmonic centrality alongside PageRank for every host). Computed
    on the undirected simple view of the rollup via the engine's
    exact all-roots kernel (cycles.harmonic_all — tractable exactly
    BECAUSE the contraction shrank the vertex count by 4-5 orders);
    host names decode back through the broadcast dictionary."""
    from graftlink.cycles import harmonic_all

    he = _rollup_for_rank(url_edges, level, src_col, dst_col)
    hosts = dense_rank_ids(
        he.select(F.col("src_host").alias("host")).unionAll(
            he.select(F.col("dst_host").alias("host"))
        ),
        "host",
    )
    enc = (
        he.join(F.broadcast(hosts.withColumnRenamed("host", "src_host")), "src_host")
        .withColumnRenamed("id", "src")
        .join(
            F.broadcast(
                hosts.select(F.col("id").alias("dst"), F.col("host").alias("dst_host"))
            ),
            "dst_host",
        )
        .select("src", "dst")
    )
    h = harmonic_all(enc, normalized=normalized)
    return h.join(F.broadcast(hosts), "id").select("host", "harmonic")


def host_harmonic_sql(urledges: str, max_depth: int = 16) -> str:
    """Twin: hosts ranked by name (ASCII — Spark and DuckDB binary
    collation agree), harmonic closure on the encoded graph, names
    joined back."""
    from graftlink.cycles import harmonic_all_sql

    he = host_edges_sql(urledges)
    hosts = (
        "SELECT host, row_number() OVER (ORDER BY host) - 1 AS id FROM ("
        f"SELECT DISTINCT src_host AS host FROM ({he}) "
        f"UNION SELECT DISTINCT dst_host FROM ({he}))"
    )
    clean = (
        f"SELECT hs.id AS src, hd.id AS dst FROM ({he}) e "
        f"JOIN ({hosts}) hs ON hs.host = e.src_host "
        f"JOIN ({hosts}) hd ON hd.host = e.dst_host"
    )
    return f"""
        WITH harm AS MATERIALIZED ({harmonic_all_sql(clean, max_depth)}),
        hx AS ({hosts})
        SELECT hx.host, harm.harmonic
        FROM harm JOIN hx ON hx.id = harm.id
    """
