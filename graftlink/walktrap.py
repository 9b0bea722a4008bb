"""Walktrap community detection: random-walk distance agglomeration.

igraph surface matched: igraph_community_walktrap (igraph@0.10.x
src/community/walktrap/walktrap.cpp wraps Pons & Latapy's sequential
heap-driven agglomeration [public anchor; NOT a port — that global
priority queue doesn't distribute]). Model: Pons & Latapy 2005,
"Computing communities in large networks using random walks"
(J. Graph Algorithms Appl. 10(2):191-218): the t-step random-walk
distribution P^t_{i,.} characterizes vertex i's community, vertices
are merged agglomeratively under the Ward-like criterion

    delta_sigma(C1,C2) = (1/n) * |C1||C2|/(|C1|+|C2|) * r^2(C1,C2),
    r^2(C1,C2) = sum_k (P_C1k - P_C2k)^2 / d_k,   P_C = mean_{i in C} P^t_i,

only adjacent communities may merge, and the dendrogram is cut at the
max-modularity level (igraph's as_clustering() default).

Distributed formulation
-----------------------
State is kept as community SUM vectors U_C = sum_{i in C} P^t_i
(DF[c, k, u]) so that a merge is a plain groupBy-sum, plus sizes and
the contracted community graph (self-loops = internal weight, which
makes per-round modularity ONE aggregate). Distances decompose into
self and cross terms,

    r^2(C,D) = S_C/|C|^2 + S_D/|D|^2 - 2*X(C,D)/(|C||D|),
    S_C = sum_k U_Ck^2/d_k,   X(C,D) = sum_k U_Ck * U_Dk / d_k,

where S is one pass over U and X is the sparse Gram product: U
self-joined on the walk-support index k, restricted to ADJACENT
community pairs (the only legal merges), all map-side partial aggs.

Instead of Pons-Latapy's sequential "merge the single global minimum"
loop, each round merges every RECIPROCAL nearest-neighbor pair
(mutual argmin of delta_sigma, ties broken by partner id). The
delta_sigma update follows the Lance-Williams Ward form, which is
REDUCIBLE (merging A,B cannot make any C closer to AUB than it was
to A or B), and for reducible metrics RNN-batched agglomeration
produces the same dendrogram as the exact sequential order (de Rham /
Juan RNN-chain argument; Murtagh 1983 survey). The max-modularity cut
is evaluated once per round (after a batch of merges) rather than
after every single merge, so the chosen level can differ from
igraph's by at most the intra-round merge granularity; tests pin the
partition against a numpy twin of this same specification
(tests/test_walktrap.py) plus planted-partition recovery and
modularity floors on the public karate fixture.

Scale envelope: computing P^t costs t sparse squarings (support grows
toward n*avg_deg^t entries) and the Gram join costs
sum_pairs |support| — walktrap is inherently Theta(m n) worst-case
(paper Sec. 4) and igraph's own docs position it below Louvain for
large graphs. The distributed shape keeps every step a partial-agg
shuffle (no driver-side state beyond scalar Q tracking), so it runs
at cluster scale for moderate vertex counts or as a refinement over
an already-coarsened community graph; for web-scale partitions use
louvain/leiden/infomap first.

No SQL oracle: the RNN argmin + merge recursion is not reasonably
CTE-expressible; driver registration is rows-only with pytest gates —
the declared weaker-check category, same as louvain/leiden/infomap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.components import _renumber
from graftlink.lineage import cut
from graftlink.louvain import _und_weighted


# _cut lives in graftlink.lineage now (shared with flow.py): eager
# localCheckpoint + propagated-statistics reset, keeping per-round
# planning O(1) across the agglomeration loop's ~5-join rounds.
_cut = lambda df: cut(df, eager=True)


def _walk_probs(wedges: DataFrame, t: int) -> DataFrame:
    """DF[i, k, p]: t-step random-walk distribution per start vertex
    over the undirected weighted view DF[a,b,w]. t-1 sparse squarings
    (join on the middle index + groupBy partial-agg sum)."""
    sym = wedges.select(F.col("a").alias("i"), F.col("b").alias("k"), "w").unionAll(
        wedges.select(F.col("b").alias("i"), F.col("a").alias("k"), "w")
    )
    deg = sym.groupBy("i").agg(F.sum("w").alias("d"))
    p1 = (
        sym.join(deg, "i")
        .select("i", "k", (F.col("w") / F.col("d")).alias("p"))
        .localCheckpoint(eager=True)
    )
    step = p1.select(F.col("i").alias("j"), F.col("k"), F.col("p").alias("q"))
    probs = p1
    for _ in range(t - 1):
        probs = (
            probs.select(F.col("i"), F.col("k").alias("j"), "p")
            .join(step, "j")
            .groupBy("i", "k")
            .agg(F.sum(F.col("p") * F.col("q")).alias("p"))
            .localCheckpoint(eager=True)
        )
    return probs


def walktrap_communities(
    edges: DataFrame,
    steps: int = 4,
    max_rounds: int = 200,
    renumber: bool = True,
    weights: str | None = None,
) -> DataFrame:
    """edges DF[src,dst] -> DF[id, community]: deterministic
    distributed walktrap (t-step walk distance, batched
    reciprocal-NN Ward agglomeration, max-modularity cut). Community
    ids are renumbered to min-member-id dense labels by default (same
    contract as louvain_communities). `weights` names an explicit
    edge-weight column (igraph ``community_walktrap(weights=)``);
    default is parallel-edge multiplicity."""
    wedges = _und_weighted(edges, weights).localCheckpoint(eager=True)

    sym = wedges.select(F.col("a").alias("i"), F.col("b").alias("k"), "w").unionAll(
        wedges.select(F.col("b").alias("i"), F.col("a").alias("k"), "w")
    )
    invdeg = (
        sym.groupBy(F.col("i").alias("k"))
        .agg((F.lit(1.0) / F.sum("w")).alias("invd"))
        .localCheckpoint(eager=True)
    )
    m2 = wedges.agg(F.sum(F.col("w") * 2)).collect()[0][0] or 1.0

    # singleton init: U = P^t rows, sizes 1, community graph = input.
    U = (
        _walk_probs(wedges, steps)
        .withColumnRenamed("i", "c")
        .withColumnRenamed("p", "u")
    )
    sizes = invdeg.select(F.col("k").alias("c"), F.lit(1).alias("n"))
    cg = wedges  # DF[a, b, w], a < b, no self-loops yet
    comm = sizes.select(F.col("c").alias("id"), F.col("c").alias("community"))

    def q_of(cgraph: DataFrame) -> float:
        """Newman Q from the contracted community graph in ONE agg:
        in_C = self-loop weight, k_C = 2*in_C + incident weight."""
        contrib = (
            cgraph.select(F.col("a").alias("c"), "b", "w")
            .unionAll(
                cgraph.where(F.col("a") != F.col("b")).select(
                    F.col("b").alias("c"), F.col("a").alias("b"), "w"
                )
            )
            .groupBy("c")
            .agg(
                F.sum(F.when(F.col("c") == F.col("b"), F.col("w")).otherwise(0.0)).alias("inw"),
                F.sum(F.when(F.col("c") == F.col("b"), 2 * F.col("w")).otherwise(F.col("w"))).alias("k"),
            )
        )
        row = contrib.agg(
            F.sum(2 * F.col("inw") / m2 - (F.col("k") / m2) ** 2).alias("q")
        ).collect()[0]
        return float(row["q"] or 0.0)

    best_q = q_of(cg)
    best_comm = comm

    for _ in range(max_rounds):
        pairs = cg.where(F.col("a") != F.col("b")).select("a", "b")
        if pairs.isEmpty():
            break

        selfS = (
            U.join(invdeg, "k")
            .groupBy("c")
            .agg(F.sum(F.col("u") * F.col("u") * F.col("invd")).alias("s"))
            .join(sizes, "c")
        )
        ua = U.select(F.col("c").alias("a"), "k", F.col("u").alias("ua"))
        ub = U.select(F.col("c").alias("b"), "k", F.col("u").alias("ub"))
        cross = (
            pairs.join(ua, "a")
            .join(ub, ["b", "k"])
            .join(invdeg, "k")
            .groupBy("a", "b")
            .agg(F.sum(F.col("ua") * F.col("ub") * F.col("invd")).alias("x"))
        )
        sa = selfS.select(
            F.col("c").alias("a"), F.col("s").alias("s_a"), F.col("n").alias("n_a")
        )
        sb = selfS.select(
            F.col("c").alias("b"), F.col("s").alias("s_b"), F.col("n").alias("n_b")
        )
        # delta_sigma up to the constant 1/n factor; rounded so the
        # argmin is immune to partial-agg summation-order fp noise.
        scored = (
            pairs.join(cross, ["a", "b"], "left")
            .join(sa, "a")
            .join(sb, "b")
            .select(
                "a",
                "b",
                F.round(
                    F.greatest(
                        F.col("s_a") / (F.col("n_a") * F.col("n_a"))
                        + F.col("s_b") / (F.col("n_b") * F.col("n_b"))
                        - 2 * F.coalesce(F.col("x"), F.lit(0.0))
                        / (F.col("n_a") * F.col("n_b")),
                        F.lit(0.0),
                    )
                    * (F.col("n_a") * F.col("n_b"))
                    / (F.col("n_a") + F.col("n_b")),
                    12,
                ).alias("ds"),
            )
        )
        both = scored.select(F.col("a").alias("c"), F.col("b").alias("o"), "ds").unionAll(
            scored.select(F.col("b").alias("c"), F.col("a").alias("o"), "ds")
        )
        nn = (
            both.groupBy("c")
            .agg(F.min(F.struct("ds", "o")).alias("m"))
            .select("c", F.col("m.o").alias("nn"), F.col("m.ds").alias("ds"))
        )
        nn = _cut(nn)
        rec = (
            nn.alias("x")
            .join(
                nn.select(F.col("c").alias("nn"), F.col("nn").alias("back")).alias("y"),
                "nn",
            )
            .where((F.col("back") == F.col("x.c")) & (F.col("x.c") < F.col("nn")))
            .select(F.col("x.c").alias("old"), F.col("x.c").alias("new"))
            .unionAll(
                nn.alias("x")
                .join(
                    nn.select(F.col("c").alias("nn"), F.col("nn").alias("back")).alias("y"),
                    "nn",
                )
                .where((F.col("back") == F.col("x.c")) & (F.col("x.c") < F.col("nn")))
                .select(F.col("nn").alias("old"), F.col("x.c").alias("new"))
            )
        )
        if rec.isEmpty():
            # always-progress fallback: merge the single globally
            # minimal pair (total order (ds, a, b) -> deterministic).
            top = scored.orderBy("ds", "a", "b").limit(1).collect()
            if not top:
                break
            a0, b0 = top[0]["a"], top[0]["b"]
            rec = scored.sparkSession.createDataFrame(
                [(a0, a0), (b0, a0)], "old long, new long"
            )
        mm = _cut(rec)

        relabel = F.coalesce(F.col("new"), F.col("c")).alias("c")
        U = (
            U.join(mm.withColumnRenamed("old", "c"), "c", "left")
            .select(relabel, "k", "u")
            .groupBy("c", "k")
            .agg(F.sum("u").alias("u"))
        )
        U = _cut(U)
        sizes = (
            sizes.join(mm.withColumnRenamed("old", "c"), "c", "left")
            .select(relabel, "n")
            .groupBy("c")
            .agg(F.sum("n").alias("n"))
        )
        sizes = _cut(sizes)
        ra = mm.select(F.col("old").alias("a"), F.col("new").alias("na"))
        rb = mm.select(F.col("old").alias("b"), F.col("new").alias("nb"))
        cg = (
            cg.join(ra, "a", "left")
            .join(rb, "b", "left")
            .select(
                F.least(
                    F.coalesce("na", "a"), F.coalesce("nb", "b")
                ).alias("a"),
                F.greatest(
                    F.coalesce("na", "a"), F.coalesce("nb", "b")
                ).alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
        )
        cg = _cut(cg)
        comm = (
            comm.join(
                mm.select(F.col("old").alias("community"), "new"), "community", "left"
            )
            .select("id", F.coalesce("new", "community").alias("community"))
        )
        comm = _cut(comm)
        q = q_of(cg)
        if q > best_q + 1e-12:
            best_q = q
            best_comm = comm

    labels = best_comm.select("id", F.col("community").alias("label"))
    mmb = labels.groupBy("label").agg(F.min("id").alias("_mm"))
    labels = labels.join(mmb, "label").select("id", F.col("_mm").alias("label"))
    if renumber:
        return _renumber(labels).withColumnRenamed("component", "community")
    return labels.select("id", F.col("label").alias("community"))
