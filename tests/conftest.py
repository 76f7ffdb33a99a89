"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from pwhl_data_engineering_pipeline_spark.session import get_spark

    # r14: default 4 shuffle partitions — the suite is dominated by per-task
    # fixed cost on tiny frames (measured: test_operators 190 s -> 166 s,
    # snapshots+cdf 128 s -> 119 s at 4), and AQE re-coalesces anything
    # size-relevant. Override with SPARK_GRAFT_TEST_SHUFFLE for debugging.
    s = get_spark(
        "tests",
        master="local[8]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "4")),
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
