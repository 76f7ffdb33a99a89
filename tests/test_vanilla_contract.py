"""Driver-fidelity guard: the driver calls queries() on its own VANILLA
SparkSession — Spark 4 defaults, ANSI mode ON — not on session.get_spark's
engine session (ANSI off for reference SAFE_* parity). Every driver-window
query must therefore execute without ANSI runtime errors (overflow, bad
cast, div-by-zero): a full-range hash summed into a long, for example,
passes ANSI-off pytest but crashes the driver (caught live in round 3 —
graph._signature's sum(xxhash64) → bit_xor).

ANSI is a runtime-settable SQL conf, so this flips it on the shared session
for the sweep and restores it after; value correctness is already covered by
the ANSI-off oracle sweep in test_entry_oracle.py — this checks execution.

r14: the per-query sweep also carries the blanket no-cartesian scale gate
(previously test_plan_quality.test_no_accidental_cartesian_anywhere, which
re-built the whole extended set a second time for ~2 min of duplicate
index/snapshot build work). The allowlist and its rationale live in
test_plan_quality (CARTESIAN_ALLOW / CARTESIAN_STREAMING /
CARTESIAN_GATE_DOC); the assertion here inspects the FULL frame's plan
before the count so column pruning cannot hide an offending join.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from .test_plan_quality import CARTESIAN_ALLOW, CARTESIAN_STREAMING


@pytest.fixture(scope="module")
def ansi_spark(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", sorted(entrymod.extended_queries()))
def test_driver_window_query_runs_under_ansi(ansi_spark, sf_dir, name):
    df = entrymod.extended_queries()[name](ansi_spark, sf_dir)
    if name not in CARTESIAN_ALLOW and name not in CARTESIAN_STREAMING:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop/cartesian join — the classic 100 TB "
            "killer; see test_plan_quality.CARTESIAN_GATE_DOC for the "
            "explicit allowlist and its rationale"
        )
    assert df.count() >= 0
