"""Mergeable-sketch operators: HLL rollup/merge invariants and count-min
frequency bounds, validated against exact computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import sketches


@pytest.fixture(scope="module")
def events(spark):
    # 5000 rows, 400 distinct users spread over 10 days
    return spark.range(5000).selectExpr(
        "CAST(id % 400 AS STRING) AS user_id",
        "CAST(id % 10 AS INT) AS day",
    )


def test_hll_rollup_and_merge_matches_direct(spark, events):
    daily = sketches.hll_rollup(events, ["day"], "user_id")
    assert daily.count() == 10
    # merging persisted daily sketches == sketching the raw union
    merged = sketches.hll_estimate(daily).collect()[0]
    direct = sketches.hll_estimate(
        sketches.hll_rollup(events, [], "user_id")
    ).collect()[0]
    # union-of-daily vs direct-over-union agree within sketch error (the
    # union gadget's target HLL type differs from the direct sketch's, so
    # estimates are close, not bit-identical)
    assert abs(merged["approx_distinct"] - direct["approx_distinct"]) <= 400 * 0.02
    assert merged["n_rows"] == 5000
    # lgk=12 → ~1.6% relative error on 400 distinct
    assert abs(merged["approx_distinct"] - 400) <= 400 * 0.05


def test_hll_estimate_per_group(spark, events):
    daily = sketches.hll_rollup(events, ["day"], "user_id")
    per_day = {r["day"]: r["approx_distinct"] for r in sketches.hll_estimate(daily, ["day"]).collect()}
    # each day sees 400 distinct users (id%400 cycles within id%10 classes...
    # actually day d contains users with id%400 where id%10==d → 40 distinct)
    exact = {
        r["day"]: r["n"]
        for r in events.groupBy("day").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    for d, est in per_day.items():
        assert abs(est - exact[d]) <= max(2, exact[d] * 0.05)


def test_cms_bounds_vs_exact(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox " + ("spark " * (i % 3))) for i in range(200)],
        "doc_id long, text string",
    )
    cms, topk = sketches.token_heavy_hitters(docs, "text", k=5, eps=0.001)
    exact = {r["token"]: r["freq"] for r in topk.collect()}
    assert exact["the"] == 200 and exact["quick"] == 200
    est = sketches.cms_estimate(spark, cms, list(exact))
    n_tokens = sum(len(("the quick brown fox " + "spark " * (i % 3)).split()) for i in range(200))
    for tok, true in exact.items():
        assert est[tok] >= true
        assert est[tok] <= true + 0.001 * n_tokens + 1
