"""Shared Spark fixture for the parity suite.

Small parallelism + small Arrow batches on purpose: tests must
exercise multi-partition paths (co-partitioned joins, two-pass id
assignment, chunked adjacency) even on 34-vertex fixtures.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from graftlink.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="graftlink-tests",
        cores=4,
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
            "spark.driver.memory": "8g",
        },
    )
    yield s


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
