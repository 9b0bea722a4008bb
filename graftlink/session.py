"""SparkSession factory with the engine's standard configuration.

Local mode is the sandbox stand-in for a multi-executor cluster
(BASELINE.md row 3): `local[8]` vs `local[32]` evidences the N vs 4N
executor scaling rule. All knobs here hold on a real cluster too —
nothing is local-mode-specific except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "graftlink",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    cores: for local mode, the parallelism level (local[cores]); None
    uses $SPARK_GRAFT_CPUS or all cores. On a real deployment the
    master comes from spark-submit and this value is ignored.
    """
    # Cap numpy/BLAS threading inside Python workers: with W workers
    # each spawning an OpenMP pool, the Arrow kernels anti-scale badly
    # (measured 4x slowdown at local[32]); one thread per worker is
    # the right shape — parallelism comes from Spark tasks.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    # Python workers must import graftlink (Arrow kernels) regardless
    # of the driver's cwd; on spark-submit deployments --py-files
    # covers this instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cores_env}]"
    else:
        master = f"local[{cores}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # One partitioning constant for the whole engine: groupBy/join
        # outputs land hash-partitioned at exactly the bucket count the
        # adjacency blocks use, so superstep joins are co-partitioned
        # (SURVEY.md §4.2.3).
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE partition coalescing would silently break the
        # adj↔state co-partitioning contract mid-loop; keep partition
        # counts pinned (skew-join stays on for the non-iterative ops).
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bound Arrow batch size so a packed hub adjacency block
        # streams through the kernel instead of materializing at once
        # (SURVEY.md §4.2.4).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # worker env on a real cluster (local mode inherits os.environ)
        .config("spark.executorEnv.OMP_NUM_THREADS", os.environ["OMP_NUM_THREADS"])
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS",
                os.environ["OPENBLAS_NUM_THREADS"])
        .config("spark.executorEnv.MKL_NUM_THREADS", os.environ["MKL_NUM_THREADS"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
