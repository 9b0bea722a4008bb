"""Lineage truncation WITHOUT propagated-statistics blowup.

`DataFrame.localCheckpoint` copies the origin plan's ESTIMATED stats
into the resulting LogicalRDD. Catalyst's size-only estimator
(`SizeInBytesOnlyStatsPlanVisitor.visitJoin` -> `default`) MULTIPLIES
child sizeInBytes across joins as arbitrary-precision BigInts, so an
iterative operator whose per-round frame is built from k joins of the
previous round's checkpoint makes the stat's BIT-LENGTH grow ~k x per
round — after a handful of rounds every planning pass spends minutes
in java.math.BigInteger Karatsuba/ToomCook multiplication (observed
in walktrap round 4: 5s -> 11s -> 204s on a 10-vertex graph; in
push-relabel round 8: 1.5s -> 6s -> 348s on an 18-vertex graph, the
driver's "Thread-3" pinned at 100% CPU inside BigInteger.multiply
while the DAG scheduler sits idle).

`cut()` rewraps the checkpointed RDD in a FRESH LogicalRDD (the same
`internalCreateDataFrame` PySpark's Arrow path uses), resetting the
estimate to spark.sql.defaultSizeInBytes and keeping per-round
planning O(1). Used by every multi-join-per-round superstep operator
(walktrap agglomeration, push-relabel max-flow).

Private-API caveat (ADVICE r3, low): `_jdf`,
`internalCreateDataFrame`, `queryExecution().toRdd()` are PySpark
internals, tested on Spark 4.1.x. On any future Spark where they
move, `cut()` degrades to the plain localCheckpoint (correct, merely
slower per round because the propagated stats grow) instead of
crashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + drop propagated statistics (module docstring).

    eager=False defers materialization to the first downstream action
    (the flow/walktrap round loops pair it with the one action that
    needs the round's statistic, so a superstep costs 2-3 Spark jobs,
    not 6)."""
    ck = df.localCheckpoint(eager=eager)
    try:
        jdf = ck._jdf
        spk = ck.sparkSession
        jnew = spk._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(jnew, spk)
    except Exception:  # pragma: no cover - Spark-version drift guard
        return ck
