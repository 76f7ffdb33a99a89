"""Plan-quality regression tests: the physical plans behind the headline
queries must keep the properties that make them scale — pruned scans with
pushed filters, broadcast joins for dimensions, partial aggregation before
exchanges, TakeOrderedAndProject for top-k. A correctness-preserving change
that silently degrades one of these is a 100 TB regression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark, sf_dir):
    df = em.queries()["p1_p5_filter_project"](spark, sf_dir)
    plan = _plan(df)
    # predicate reaches the parquet scan
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_quantity,45.0)" in plan
    # column pruning: untouched wide columns are not read
    assert "l_comment" not in plan and "l_tax" not in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(em.queries()["j1_broadcast_enrich"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_partial_aggregation_before_exchange(spark, sf_dir):
    plan = _plan(em.queries()["a1_daily_rollup"](spark, sf_dir))
    # map-side partial agg must appear below the shuffle
    assert "partial_" in plan
    assert "Exchange hashpartitioning" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(em.queries()["o3_topk"](spark, sf_dir))
    # no global sort: per-partition heaps + driver merge
    assert "TakeOrderedAndProject" in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    plan = _plan(em.queries()["j_asof_join"](spark, sf_dir))
    # one hash exchange on the key (plus possibly AQE reads) — the whole
    # point of the union+window composition is avoiding a range-join blowup
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") <= 2  # union sides coalesce under AQE


def test_minhash_signature_evaluated_once(spark, sf_dir):
    # the candidate-pair plan must contain exactly one signature stage
    # (ArrowEvalPython); a self-join regression would double it
    plan = _plan(em.queries()["ns_minhash_pairs"](spark, sf_dir))
    assert plan.count("ArrowEvalPython") == 1


def test_brute_force_broadcasts_queries(spark, sf_dir):
    plan = _plan(em.queries()["ns_ann_bruteforce"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
