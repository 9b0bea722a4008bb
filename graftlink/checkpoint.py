"""Per-iteration durable checkpoints with lineage metadata (E20).

Contract (north_rule): every iteration checkpoints per-partition
rank/label state with lineage + counters so a killed job resumes
mid-algorithm. Layout per FIXTURES.md F3:

    <base>/<algo>/it=<k>/part-*.parquet  (+ _SUCCESS)
    <base>/<algo>/it=<k>/_lineage.json

_lineage.json: {algo, iteration, input_fingerprint, rows,
partition_rows (per-partition lineage), counters (edges_processed,
delta, changed, ...), wall_ms, schema}. Writes are atomic: parquet
goes to a `.tmp` dir, lineage is written inside it, then one rename
publishes the iteration. `latest()` only trusts directories with
both _SUCCESS and _lineage.json.

Checkpointing doubles as iterative-plan lineage truncation
(SURVEY.md §4.2.1): `save` returns a fresh read of the parquet, so
each superstep's logical plan is depth-1 instead of growing with the
iteration count. mode="local" (localCheckpoint) is the in-memory
variant for benches/tests that don't need durability.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(
        self,
        base_dir: str | None,
        algo: str,
        spark: SparkSession,
        input_fingerprint: str = "",
        mode: str = "durable",
        buckets: int | None = None,
        truncate_every: int = 4,
    ):
        self.base = os.path.join(base_dir, algo) if base_dir else None
        self.algo = algo
        self.spark = spark
        self.fingerprint = input_fingerprint
        self.mode = mode if base_dir else "local"
        self.buckets = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
        self.truncate_every = truncate_every
        self._t0 = time.monotonic()
        self._prev_cached: DataFrame | None = None
        if self.base:
            os.makedirs(self.base, exist_ok=True)

    def _it_dir(self, iteration: int) -> str:
        return os.path.join(self.base, f"it={iteration}")

    def save(
        self,
        df: DataFrame,
        iteration: int,
        key: str,
        counters: dict[str, Any],
        stats_cols: list | None = None,
    ):
        """Persist state; return a lineage-truncated, co-partitioned DF.

        With `stats_cols`, the convergence aggregates are computed in
        the SAME Spark job that materializes the state and
        `(state_df, stats_row)` is returned — in local (bench) mode
        that makes each superstep exactly ONE job: persist() keeps the
        join-output partitioning (hash(key, B)) so no re-exchange is
        needed, unlike localCheckpoint which drops SQL partitioning
        metadata and would force every next superstep join to
        re-shuffle AND re-sort the much larger adjacency side.
        Plan lineage is truncated every `truncate_every` iterations:
        persist caches data but keeps the logical plan growing, and a
        superstep references the previous state TWICE (gather join +
        update join), so plan size doubles per iteration — depth d
        costs 2^d plan copies in analysis/AQE-explain. 4 bounds that
        at 16x while keeping 3 of 4 supersteps single-job.
        """
        if self.mode == "local":
            out = df.persist()
            row = None
            if stats_cols is not None:
                row = out.agg(*stats_cols).collect()[0]
            else:
                out.count()
            if (iteration + 1) % self.truncate_every == 0:
                trunc = out.localCheckpoint(eager=True).repartition(self.buckets, key)
                out.unpersist()
                out = trunc
                cached = None
            else:
                cached = out
            # previous iteration's cache is safe to drop only now —
            # the current state is materialized above
            if self._prev_cached is not None:
                self._prev_cached.unpersist()
            self._prev_cached = cached
            return (out, row) if stats_cols is not None else out
        it_dir = self._it_dir(iteration)
        tmp = it_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        back = self.spark.read.parquet(tmp)
        partition_rows = [
            [r["_pid"], r["cnt"]]
            for r in back.groupBy(F.spark_partition_id().alias("_pid"))
            .agg(F.count("*").alias("cnt"))
            .orderBy("_pid")
            .collect()
        ]
        lineage = {
            "algo": self.algo,
            "iteration": iteration,
            "input_fingerprint": self.fingerprint,
            "rows": int(sum(c for _, c in partition_rows)),
            "partition_rows": partition_rows,
            "counters": counters,
            "wall_ms": int((time.monotonic() - self._t0) * 1000),
            "schema": df.schema.jsonValue(),
        }
        with open(os.path.join(tmp, "_lineage.json"), "w") as f:
            json.dump(lineage, f)
        # stats must be computed while `back` still points at tmp —
        # the rename below invalidates that read path
        stats_row = back.agg(*stats_cols).collect()[0] if stats_cols is not None else None
        if os.path.exists(it_dir):
            shutil.rmtree(it_dir)
        os.rename(tmp, it_dir)
        # re-read + re-pin partitioning so the next superstep join stays
        # co-partitioned with the adjacency blocks
        out = self.spark.read.parquet(it_dir).repartition(self.buckets, key)
        if stats_cols is not None:
            return out, stats_row
        return out

    def release(self) -> None:
        """Drop the last iteration's persisted state. Call after the
        algorithm's loop, AFTER detaching the final result (e.g. via
        localCheckpoint) — otherwise repeated algorithm calls in one
        session accumulate cached partitions in executor memory."""
        if self._prev_cached is not None:
            self._prev_cached.unpersist()
            self._prev_cached = None

    def finalize(self, df: DataFrame) -> DataFrame:
        """Detach a final-result DF from the loop's cached lineage
        (one eager localCheckpoint — fine once, quadratic if chained
        per-iteration) and release the loop's persisted state."""
        out = df.localCheckpoint(eager=True)
        self.release()
        return out

    def latest(self) -> tuple[int, dict] | None:
        """Highest valid (=_SUCCESS + _lineage.json, matching
        fingerprint) iteration, or None."""
        if self.mode == "local" or not self.base or not os.path.isdir(self.base):
            return None
        best: tuple[int, dict] | None = None
        for name in os.listdir(self.base):
            if not name.startswith("it=") or name.endswith(".tmp"):
                continue
            it_dir = os.path.join(self.base, name)
            lineage_path = os.path.join(it_dir, "_lineage.json")
            if not (
                os.path.exists(os.path.join(it_dir, "_SUCCESS"))
                and os.path.exists(lineage_path)
            ):
                continue
            with open(lineage_path) as f:
                lineage = json.load(f)
            if self.fingerprint and lineage.get("input_fingerprint") != self.fingerprint:
                continue
            k = int(name.split("=", 1)[1])
            if best is None or k > best[0]:
                best = (k, lineage)
        return best

    def iterations(self) -> list[int]:
        """All valid (=_SUCCESS + _lineage.json, matching fingerprint)
        iteration numbers, ascending. Used by algorithms whose resume
        state spans MULTIPLE iterations (e.g. Brandes' backward pass
        keeps every level's delta frame), not just the latest."""
        if self.mode == "local" or not self.base or not os.path.isdir(self.base):
            return []
        out = []
        for name in os.listdir(self.base):
            if not name.startswith("it=") or name.endswith(".tmp"):
                continue
            it_dir = os.path.join(self.base, name)
            lineage_path = os.path.join(it_dir, "_lineage.json")
            if not (
                os.path.exists(os.path.join(it_dir, "_SUCCESS"))
                and os.path.exists(lineage_path)
            ):
                continue
            with open(lineage_path) as f:
                lineage = json.load(f)
            if self.fingerprint and lineage.get("input_fingerprint") != self.fingerprint:
                continue
            out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def load(self, iteration: int, key: str) -> DataFrame:
        return self.spark.read.parquet(self._it_dir(iteration)).repartition(
            self.buckets, key
        )


def fingerprint_edges(edges: DataFrame) -> str:
    """Cheap deterministic content fingerprint of an edge table (resume
    safety: a checkpoint is only valid for the same input)."""
    row = edges.agg(
        F.count("*").alias("m"),
        F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
    ).collect()[0]
    return f"m={row['m']},h={row['h']}"
