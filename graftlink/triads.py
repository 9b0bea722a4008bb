"""Directed triad census — the 16 Davis–Leinhardt MAN classes.

igraph surface matched: `igraph_triad_census` (igraph@0.10.x
src/misc/motifs.c [unverified file]; python `Graph.triad_census()`),
which returns the count of induced 3-vertex subgraph classes
003 012 102 021D 021U 021C 111D 111U 030T 030C 201 120D 120U 120C
210 300.

Distributed decomposition (the Batagelj–Mrvar closed-form structure,
"A subquadratic triad census algorithm", 2001 — re-expressed as
partial aggregations so nothing enumerates open triples):

1. **Pair codes**: one groupBy on the canonical (min,max) pair →
   code ∈ {1: lo→hi, 2: hi→lo, 3: mutual}.
2. **2-linked-pair types in closed form**: per-vertex counts of pure-
   out / pure-in / mutual incident pairs (od, id, md) give
   021D = ΣC(od,2), 021U = ΣC(id,2), 021C = Σod·id, 111U = Σmd·od,
   111D = Σmd·id, 201 = ΣC(md,2) — MINUS the combos sitting inside
   fully-linked triples. Pure partial-agg sums; a 10⁷-degree hub is
   one row of arithmetic, never 10¹⁴ enumerated wedges.
3. **3-linked-pair types**: enumerate undirected triangles with the
   degree-ordered orientation join (O(m^1.5), power-law-safe —
   triangles._closed_triangles), join the three pair codes, fold to a
   6-bit mask, bucket by the 64-entry lookup. Triangle masks also
   supply the step-2 corrections and the common-neighbor sums below.
4. **1-linked-pair types** (012/102): per linked pair, third vertices
   adjacent to neither endpoint = (n−2) − (d(a)−1) − (d(b)−1)
   + cn(a,b). Summed per code class this needs only Σ d(v)·(incident
   pair counts) — vertex-keyed aggs — and Σ cn per class, read off
   the triangle masks. No pair-neighborhood enumeration.
5. **003** = C(n,3) − everything else.

Driver-side work is a handful of scalar aggregates plus the ≤64-row
mask histogram; the only shuffles are the pair groupBy, the vertex
groupBy, and the oriented triangle join.

The mask→class table is generated from the public Davis–Leinhardt
templates (verified by exhaustive isomorphism against
networkx.triad_graph over all 64 masks; pytest re-checks the full
census against networkx.triadic_census on random digraphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIAD_NAMES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

# mask bits over the sorted triple (i < j < k):
#   1: i→j   2: j→i   4: i→k   8: k→i   16: j→k   32: k→j
TRIAD_TABLE = {
    0: "003", 1: "012", 2: "012", 3: "102", 4: "012", 5: "021D",
    6: "021C", 7: "111U", 8: "012", 9: "021C", 10: "021U", 11: "111D",
    12: "102", 13: "111U", 14: "111D", 15: "201", 16: "012",
    17: "021C", 18: "021D", 19: "111U", 20: "021U", 21: "030T",
    22: "030T", 23: "120U", 24: "021C", 25: "030C", 26: "030T",
    27: "120C", 28: "111D", 29: "120C", 30: "120D", 31: "210",
    32: "012", 33: "021U", 34: "021C", 35: "111D", 36: "021C",
    37: "030T", 38: "030C", 39: "120C", 40: "021D", 41: "030T",
    42: "030T", 43: "120D", 44: "111U", 45: "120U", 46: "120C",
    47: "210", 48: "102", 49: "111D", 50: "111U", 51: "201",
    52: "111D", 53: "120D", 54: "120C", 55: "210", 56: "111U",
    57: "120C", 58: "120U", 59: "210", 60: "201", 61: "210",
    62: "210", 63: "300",
}

_COMBO_TYPE = {
    ("out", "out"): "021D", ("in", "in"): "021U",
    ("out", "in"): "021C", ("in", "out"): "021C",
    ("mut", "out"): "111U", ("out", "mut"): "111U",
    ("mut", "in"): "111D", ("in", "mut"): "111D",
    ("mut", "mut"): "201",
}


def _pair_bits(mask: int):
    """The three 2-bit pair codes of a mask: (i,j), (i,k), (j,k)."""
    return mask & 3, (mask >> 2) & 3, (mask >> 4) & 3


def _role(code: int, lower_end: bool) -> str:
    """out/in/mut from an endpoint's perspective; code bit 1 = lo→hi."""
    if code == 3:
        return "mut"
    fwd = code == 1
    return ("out" if fwd else "in") if lower_end else ("in" if fwd else "out")


def _triangle_props():
    """For each fully-linked mask: (class, {2-pair-type: #centers with
    that combo}, #asym pairs, #mut pairs) — the correction terms."""
    props = {}
    for mask, name in TRIAD_TABLE.items():
        cij, cik, cjk = _pair_bits(mask)
        if 0 in (cij, cik, cjk):
            continue
        # incident (pair, is_lower_end) per center: i=(ij,ik) j=(ij,jk) k=(ik,jk)
        centers = [
            (_role(cij, True), _role(cik, True)),
            (_role(cij, False), _role(cjk, True)),
            (_role(cik, False), _role(cjk, False)),
        ]
        corr: dict[str, int] = {}
        for combo in centers:
            t = _COMBO_TYPE[combo]
            corr[t] = corr.get(t, 0) + 1
        n_asym = sum(1 for c in (cij, cik, cjk) if c in (1, 2))
        n_mut = sum(1 for c in (cij, cik, cjk) if c == 3)
        props[mask] = (name, corr, n_asym, n_mut)
    return props

_TRI_PROPS = _triangle_props()


def triad_census(edges: DataFrame) -> DataFrame:
    """One-row DF[t003, t012, ..., t300] (long) — counts of the 16
    induced triad classes. Self-loops/duplicate edges ignored."""
    spark = edges.sparkSession
    from graftlink.docs_graph import clean_edges
    from graftlink.triangles import _closed_triangles

    e = clean_edges(edges).localCheckpoint(eager=True)
    # 1. pair codes
    codes = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            (F.col("src") < F.col("dst")).cast("int").alias("_f"),
            (F.col("src") > F.col("dst")).cast("int").alias("_r"),
        )
        .groupBy("a", "b")
        .agg((F.max("_f") + 2 * F.max("_r")).alias("code"))
        .localCheckpoint(eager=True)
    )
    # 2. per-vertex incident-pair roles
    ends = codes.select(
        F.col("a").alias("id"),
        F.when(F.col("code") == 3, "mut")
        .when(F.col("code") == 1, "out")
        .otherwise("in")
        .alias("role"),
    ).unionByName(
        codes.select(
            F.col("b").alias("id"),
            F.when(F.col("code") == 3, "mut")
            .when(F.col("code") == 2, "out")
            .otherwise("in")
            .alias("role"),
        )
    )
    per_v = ends.groupBy("id").agg(
        F.sum((F.col("role") == "out").cast("long")).alias("od"),
        F.sum((F.col("role") == "in").cast("long")).alias("idg"),
        F.sum((F.col("role") == "mut").cast("long")).alias("md"),
    )
    od, idg, md = F.col("od"), F.col("idg"), F.col("md")
    d = od + idg + md
    # Exact integer arithmetic throughout: C(x,2) sums are kept as
    # Σ x·(x-1) in bigint and halved driver-side (the product is always
    # even) so counts stay exact past 2^53 — the double-division form
    # loses integer precision at the 1e9-edge design point.
    sums = per_v.agg(
        F.sum((od * (od - 1)).cast("long")).alias("r021D2"),
        F.sum((idg * (idg - 1)).cast("long")).alias("r021U2"),
        F.sum((od * idg).cast("long")).alias("r021C"),
        F.sum((md * od).cast("long")).alias("r111U"),
        F.sum((md * idg).cast("long")).alias("r111D"),
        F.sum((md * (md - 1)).cast("long")).alias("r2012"),
        F.sum(((od + idg) * (d - 1)).cast("long")).alias("sum_d_asym"),
        F.sum((md * (d - 1)).cast("long")).alias("sum_d_mut"),
        F.count("*").alias("n"),
    ).collect()[0]
    pair_counts = codes.agg(
        F.sum((F.col("code") != 3).cast("long")).alias("asym"),
        F.sum((F.col("code") == 3).cast("long")).alias("mut"),
    ).collect()[0]

    # 3. fully-linked triples: oriented triangle join + 3 code joins
    tri = _closed_triangles(e)
    t = tri.select(
        F.least("u", "v", "w").alias("i"),
        F.greatest("u", "v", "w").alias("k"),
        (F.col("u") + F.col("v") + F.col("w")
         - F.least("u", "v", "w") - F.greatest("u", "v", "w")).alias("j"),
    )
    cij = codes.select(F.col("a").alias("i"), F.col("b").alias("j"),
                       F.col("code").alias("cij"))
    cik = codes.select(F.col("a").alias("i"), F.col("b").alias("k"),
                       F.col("code").alias("cik"))
    cjk = codes.select(F.col("a").alias("j"), F.col("b").alias("k"),
                       F.col("code").alias("cjk"))
    masks = (
        t.join(cij, ["i", "j"]).join(cik, ["i", "k"]).join(cjk, ["j", "k"])
        .select(
            (F.col("cij") + F.col("cik") * 4 + F.col("cjk") * 16).alias("mask")
        )
        .groupBy("mask")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )

    # 4. assemble driver-side (<= 64 rows + scalars)
    out = {name: 0 for name in TRIAD_NAMES}
    raw = {
        "021D": (sums["r021D2"] or 0) // 2,
        "021U": (sums["r021U2"] or 0) // 2,
        "021C": sums["r021C"] or 0,
        "111U": sums["r111U"] or 0,
        "111D": sums["r111D"] or 0,
        "201": (sums["r2012"] or 0) // 2,
    }
    cn_asym = cn_mut = 0
    for row in masks:
        name, corr, n_asym, n_mut = _TRI_PROPS[int(row["mask"])]
        out[name] += row["cnt"]
        for typ, c in corr.items():
            raw[typ] -= c * row["cnt"]
        cn_asym += n_asym * row["cnt"]
        cn_mut += n_mut * row["cnt"]
    for typ, v in raw.items():
        out[typ] += int(v)
    n = sums["n"]
    asym, mut = pair_counts["asym"] or 0, pair_counts["mut"] or 0
    # Σ_{pairs of class X} (d(a)-1)+(d(b)-1) = Σ_v (incident X pairs)·(d(v)-1)
    out["012"] += asym * (n - 2) - int(sums["sum_d_asym"] or 0) + cn_asym
    out["102"] += mut * (n - 2) - int(sums["sum_d_mut"] or 0) + cn_mut
    out["003"] = n * (n - 1) * (n - 2) // 6 - sum(
        out[x] for x in TRIAD_NAMES if x != "003"
    )
    row = {f"t{name.lower()}": int(out[name]) for name in TRIAD_NAMES}
    return spark.createDataFrame(
        [row], ", ".join(f"t{name.lower()} long" for name in TRIAD_NAMES)
    )


def triad_census_sql(clean: str) -> str:
    """DuckDB twin with a DIFFERENT decomposition: connected triples
    are enumerated directly (wedge join + distinct), classified by the
    same mask table; only 012/102/003 use the closed forms."""
    case = " ".join(
        f"WHEN {m} THEN '{name}'" for m, name in sorted(TRIAD_TABLE.items())
    )
    return f"""
        WITH e AS MATERIALIZED ({clean}),
        codes AS MATERIALIZED (
            SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                   max(CASE WHEN src < dst THEN 1 ELSE 0 END)
                   + 2 * max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS code
            FROM e GROUP BY 1, 2
        ),
        und AS MATERIALIZED (
            SELECT a AS u, b AS v FROM codes
            UNION ALL SELECT b, a FROM codes
        ),
        triples AS MATERIALIZED (
            SELECT DISTINCT
                   least(w1.v, w2.v, w1.u) AS i,
                   w1.u + w1.v + w2.v
                     - least(w1.v, w2.v, w1.u)
                     - greatest(w1.v, w2.v, w1.u) AS j,
                   greatest(w1.v, w2.v, w1.u) AS k
            FROM und w1 JOIN und w2
              ON w1.u = w2.u AND w1.v < w2.v
        ),
        masked AS (
            SELECT coalesce(cij.code, 0)
                   + 4 * coalesce(cik.code, 0)
                   + 16 * coalesce(cjk.code, 0) AS mask
            FROM triples t
            LEFT JOIN codes cij ON cij.a = t.i AND cij.b = t.j
            LEFT JOIN codes cik ON cik.a = t.i AND cik.b = t.k
            LEFT JOIN codes cjk ON cjk.a = t.j AND cjk.b = t.k
        ),
        by_type AS (
            SELECT CASE mask {case} END AS typ, count(*) AS cnt
            FROM masked GROUP BY 1
        ),
        deg AS (
            SELECT u AS id, count(*) AS d FROM und GROUP BY 1
        ),
        nv AS (SELECT count(*) AS n FROM deg),
        -- 1-linked-pair classes: per pair, (n-2)-(d(a)-1)-(d(b)-1)+cn;
        -- cn = common neighbors, counted from the wedge join
        cn AS (
            SELECT least(w1.v, w2.v) AS a, greatest(w1.v, w2.v) AS b,
                   count(*) AS c
            FROM und w1 JOIN und w2 ON w1.u = w2.u AND w1.v < w2.v
            GROUP BY 1, 2
        ),
        singles AS (
            SELECT
              CAST(sum(CASE WHEN p.code <> 3 THEN
                (SELECT n FROM nv) - 2 - (da.d - 1) - (db.d - 1)
                  + coalesce(cn.c, 0) ELSE 0 END) AS BIGINT) AS c012,
              CAST(sum(CASE WHEN p.code = 3 THEN
                (SELECT n FROM nv) - 2 - (da.d - 1) - (db.d - 1)
                  + coalesce(cn.c, 0) ELSE 0 END) AS BIGINT) AS c102
            FROM codes p
            JOIN deg da ON da.id = p.a
            JOIN deg db ON db.id = p.b
            LEFT JOIN cn ON cn.a = p.a AND cn.b = p.b
        ),
        tt AS (
            SELECT {", ".join(
                f"CAST(coalesce(sum(CASE WHEN typ = '{name}' THEN cnt END), 0)"
                f" AS BIGINT) AS t{name.lower()}"
                for name in TRIAD_NAMES if name not in ("003", "012", "102")
            )}
            FROM by_type
        )
        SELECT
          CAST((SELECT n * (n-1) * (n-2) // 6 FROM nv)
               - (SELECT c012 FROM singles) - (SELECT c102 FROM singles)
               - t021d - t021u - t021c - t111d - t111u - t030t - t030c
               - t201 - t120d - t120u - t120c - t210 - t300
               AS BIGINT) AS t003,
          (SELECT c012 FROM singles) AS t012,
          (SELECT c102 FROM singles) AS t102,
          t021d, t021u, t021c, t111d, t111u, t030t, t030c, t201,
          t120d, t120u, t120c, t210, t300
        FROM tt
    """
