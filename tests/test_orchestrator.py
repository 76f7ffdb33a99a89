"""Orchestrator EP1 semantics: ordered, timed, skippable, fail-fast."""

from __future__ import annotations

import pytest

from pwhl_data_engineering_pipeline_spark.plans.pipeline import Orchestrator


def test_stages_run_in_order_and_are_timed():
    orch = Orchestrator()
    seen = []
    orch.run_stage("a", lambda: seen.append("a"))
    orch.run_stage("b", lambda: seen.append("b"))
    assert seen == ["a", "b"]
    assert [r.name for r in orch.results] == ["a", "b"]
    assert all(r.seconds >= 0 and not r.skipped for r in orch.results)


def test_skip_records_without_running():
    orch = Orchestrator()
    ran = []
    out = orch.run_stage("skipped", lambda: ran.append(1), skip=True)
    assert out is None and ran == [] and orch.results[0].skipped


def test_fail_fast_propagates():
    orch = Orchestrator()

    def boom():
        raise RuntimeError("stage exploded")

    with pytest.raises(RuntimeError, match="stage exploded"):
        orch.run_stage("bad", boom)
    # the failing stage is not recorded as completed
    assert orch.results == []
