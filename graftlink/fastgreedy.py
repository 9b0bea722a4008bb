"""Fastgreedy (Clauset-Newman-Moore) community detection: greedy
modularity agglomeration.

igraph surface matched: igraph_community_fastgreedy (igraph@0.10.x
src/community/fast_modularity.c wraps the CNM max-heap greedy
[public anchor; NOT a port — that global heap of ΔQ entries is
inherently sequential]). Model: Clauset, Newman & Moore 2004,
"Finding community structure in very large networks" (PRE 70,
066111): start from singleton communities and repeatedly merge the
community pair with the largest modularity gain

    ΔQ(A,B) = 2 * ( w_AB / m2  -  k_A * k_B / m2^2 ),   m2 = 2m,

where w_AB is the inter-community weight and k_C the total weighted
degree of C; igraph's as_clustering() then cuts the dendrogram at the
maximum-modularity level.

Distributed formulation
-----------------------
The ONLY state is the contracted community graph DF[a, b, w]
(a <= b; the a == b row carries internal weight), the same coarsening
primitive louvain/walktrap already use. Per round:

- k_C is one partial-agg groupBy over the contracted graph,
- ΔQ is a pure column expression on adjacent pairs (two broadcast-
  eligible joins of the k table),
- instead of CNM's sequential "pop the single global max" heap, every
  RECIPROCAL best-pair (mutual argmax of ΔQ, ties broken by partner
  id) with ΔQ > 0 merges in the same round; disjoint merges are
  EXACTLY additive (w and k of uninvolved pairs are untouched), so Q
  strictly increases each round,
- contraction is the relabel + groupBy-sum quotient.

Stopping rule == max-modularity cut, exactly: ΔQ is additive under
contraction (ΔQ(A∪B, C) = ΔQ(A,C) + ΔQ(B,C) with w and k additive),
so once every adjacent pair has ΔQ <= 0 no sequence of further merges
can ever produce a positive one — the greedy fixpoint IS the
dendrogram's maximum-modularity level. The batched merge order can
differ from igraph's single-heap order (documented deviation, same as
walktrap's RNN batching); tests pin the partition against a numpy
twin of this same specification plus planted-partition recovery,
modularity floors on the public karate fixture, and determinism.

Scale envelope: rounds are O(log n) typical (reciprocal matching
merges a constant fraction of communities per round) and every step
is a partial-agg shuffle on the CONTRACTED graph, which shrinks
geometrically — the same envelope as one Louvain level. CNM is the
classic "very large networks" greedy; this restatement keeps no
driver-side state beyond the round counter.

No SQL oracle: the argmax-matching + merge recursion is not
reasonably CTE-expressible; driver registration is rows-only with
pytest gates — the declared weaker-check category, same as
louvain/leiden/infomap/walktrap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlink.components import _renumber
from graftlink.lineage import cut
from graftlink.louvain import _und_weighted

_cut = lambda df: cut(df, eager=True)


def fastgreedy_communities(
    edges: DataFrame,
    max_rounds: int = 200,
    renumber: bool = True,
    weights: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    fingerprint: str = "",
) -> DataFrame:
    """edges DF[src,dst] -> DF[id, community]: deterministic
    distributed CNM greedy modularity agglomeration (batched
    reciprocal best-pair merges, greedy-fixpoint == max-modularity
    cut). Community ids are renumbered to min-member-id dense labels
    by default (same contract as louvain_communities). `weights`
    names an explicit edge-weight column (igraph
    ``community_fastgreedy(weights=)``); default is parallel-edge
    multiplicity.

    With `checkpoint_dir`, the (contracted graph, id->community
    mapping) pair lands durably after every completed merge ROUND —
    the contracted graph shrinks monotonically, so round granularity
    writes O(current graph) state; m2 is invariant under contraction
    and is recomputed from the input. resume=True restarts from the
    last completed round (the greedy trajectory is deterministic, so
    resumed == uninterrupted exactly)."""
    spark = edges.sparkSession
    durable = checkpoint_dir is not None
    from graftlink.checkpoint import CheckpointManager

    mgr_g = CheckpointManager(
        checkpoint_dir, "fastgreedy-cg", spark, input_fingerprint=fingerprint
    )
    mgr_c = CheckpointManager(
        checkpoint_dir, "fastgreedy-comm", spark, input_fingerprint=fingerprint
    )
    wedges = _und_weighted(edges, weights).localCheckpoint(eager=True)
    m2 = (wedges.agg(F.sum(F.col("w") * 2)).collect()[0][0]) or 1.0

    start_rnd = 0
    cg = comm = None
    if resume and durable:
        fg, fc = mgr_g.latest(), mgr_c.latest()
        if fg is not None and fc is not None:
            r0 = min(fg[0], fc[0])
            cg = mgr_g.load(r0, "a").localCheckpoint(eager=True)
            comm = mgr_c.load(r0, "id").localCheckpoint(eager=True)
            start_rnd = r0 + 1
    if cg is None:
        cg = wedges  # DF[a, b, w]: a <= b, a == b row = internal weight
        comm = (
            wedges.select(F.col("a").alias("id"))
            .unionAll(wedges.select(F.col("b").alias("id")))
            .distinct()
            .select("id", F.col("id").alias("community"))
        )
        comm = _cut(comm)

    for rnd in range(start_rnd, max_rounds):
        pairs = cg.where(F.col("a") != F.col("b"))
        # k_C = 2*internal + incident weight, one partial-agg groupBy.
        k = (
            cg.select(F.col("a").alias("c"), "b", "w")
            .unionAll(
                cg.where(F.col("a") != F.col("b")).select(
                    F.col("b").alias("c"), F.col("a").alias("b"), "w"
                )
            )
            .groupBy("c")
            .agg(
                F.sum(
                    F.when(F.col("c") == F.col("b"), 2 * F.col("w")).otherwise(F.col("w"))
                ).alias("k")
            )
        )
        ka = k.select(F.col("c").alias("a"), F.col("k").alias("ka"))
        kb = k.select(F.col("c").alias("b"), F.col("k").alias("kb"))
        # ΔQ rounded so the argmax is immune to partial-agg
        # summation-order fp noise (the walktrap ds discipline).
        scored = (
            pairs.join(ka.hint("shuffle_hash"), "a")
            .join(kb.hint("shuffle_hash"), "b")
            .select(
                "a",
                "b",
                F.round(
                    2 * (F.col("w") / m2 - F.col("ka") * F.col("kb") / (m2 * m2)),
                    12,
                ).alias("dq"),
            )
            .where(F.col("dq") > 0)
        )
        scored = _cut(scored)
        if scored.isEmpty():
            break  # greedy fixpoint == max-modularity cut (see module doc)

        both = scored.select(F.col("a").alias("c"), F.col("b").alias("o"), "dq").unionAll(
            scored.select(F.col("b").alias("c"), F.col("a").alias("o"), "dq")
        )
        # best partner: max dq, ties -> min partner id (total order via
        # min over (-dq, o); dq is rounded so negation is exact).
        nn = (
            both.groupBy("c")
            .agg(F.min(F.struct((-F.col("dq")).alias("nd"), F.col("o"))).alias("m"))
            .select("c", F.col("m.o").alias("nn"))
        )
        nn = _cut(nn)
        rec_half = (
            nn.alias("x")
            .join(
                nn.select(F.col("c").alias("nn"), F.col("nn").alias("back"))
                .hint("shuffle_hash")
                .alias("y"),
                "nn",
            )
            .where((F.col("back") == F.col("x.c")) & (F.col("x.c") < F.col("nn")))
        )
        rec = rec_half.select(F.col("x.c").alias("old"), F.col("x.c").alias("new")).unionAll(
            rec_half.select(F.col("nn").alias("old"), F.col("x.c").alias("new"))
        )
        mm = _cut(rec)
        if mm.isEmpty():
            # always-progress fallback: merge the single globally best
            # positive pair (total order (-dq, a, b) -> deterministic).
            top = scored.orderBy(F.col("dq").desc(), "a", "b").limit(1).collect()
            a0, b0 = top[0]["a"], top[0]["b"]
            mm = scored.sparkSession.createDataFrame(
                [(a0, a0), (b0, a0)], "old long, new long"
            )

        ra = mm.select(F.col("old").alias("a"), F.col("new").alias("na"))
        rb = mm.select(F.col("old").alias("b"), F.col("new").alias("nb"))
        cg = (
            cg.join(ra.hint("shuffle_hash"), "a", "left")
            .join(rb.hint("shuffle_hash"), "b", "left")
            .select(
                F.least(F.coalesce("na", "a"), F.coalesce("nb", "b")).alias("a"),
                F.greatest(F.coalesce("na", "a"), F.coalesce("nb", "b")).alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
        )
        cg = _cut(cg)
        comm = (
            comm.join(
                mm.select(F.col("old").alias("community"), "new").hint(
                    "shuffle_hash"
                ),
                "community",
                "left",
            ).select("id", F.coalesce("new", "community").alias("community"))
        )
        comm = _cut(comm)
        if durable:
            cg = mgr_g.save(cg, rnd, "a", counters={"round": rnd})
            comm = mgr_c.save(comm, rnd, "id", counters={"round": rnd})
    else:
        k = (
            cg.select(F.col("a").alias("c"), "b", "w")
            .unionAll(
                cg.where(F.col("a") != F.col("b")).select(
                    F.col("b").alias("c"), F.col("a").alias("b"), "w"
                )
            )
            .groupBy("c")
            .agg(
                F.sum(
                    F.when(F.col("c") == F.col("b"), 2 * F.col("w")).otherwise(F.col("w"))
                ).alias("k")
            )
        )
        residual = (
            cg.where(F.col("a") != F.col("b"))
            .join(k.select(F.col("c").alias("a"), F.col("k").alias("ka")), "a")
            .join(k.select(F.col("c").alias("b"), F.col("k").alias("kb")), "b")
            .where(
                F.round(2 * (F.col("w") / m2 - F.col("ka") * F.col("kb") / (m2 * m2)), 12)
                > 0
            )
        )
        if not residual.isEmpty():
            raise RuntimeError(
                f"fastgreedy did not reach its greedy fixpoint in {max_rounds} rounds"
            )

    labels = comm.select("id", F.col("community").alias("label"))
    mmb = labels.groupBy("label").agg(F.min("id").alias("_mm"))
    labels = labels.join(mmb.hint("shuffle_hash"), "label").select(
        "id", F.col("_mm").alias("label")
    )
    if renumber:
        return _renumber(labels).withColumnRenamed("component", "community")
    return labels.select("id", F.col("label").alias("community"))
