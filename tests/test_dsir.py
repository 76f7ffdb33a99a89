"""Unit tests: operators.dsir (hashed-ngram importance resampling,
Xie et al. 2023). Semantics pinned against a from-scratch Python model of
the published weight formula — independent of both the Spark plan and the
SQL mirror (which test_entry_oracle cross-checks separately)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import dsir

RAW = [
    (1, "spark shuffle join spark shuffle"),
    (2, "cat videos cat videos cat"),
    (3, "spark join agg window"),
    (4, "dog videos funny dog"),
    (5, "spark window agg shuffle join"),
]
TARGET = [
    (101, "spark join window"),
    (102, "spark shuffle agg"),
]
B = 512
ALPHA = 1.0


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW, "doc_id long, text string")


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


def _bucket(gram: str) -> int:
    return int(hashlib.md5(f"dsir:{gram}".encode()).hexdigest()[:8], 16) % B


def _grams(text: str) -> list[str]:
    toks = text.lower().split()
    return toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]


def _expected_scores() -> dict[int, float]:
    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for d, txt in RAW:
        bks = [_bucket(g) for g in _grams(txt)]
        per_doc[d] = bks
        for b in bks:
            rc[b] = rc.get(b, 0) + 1
    for _, txt in TARGET:
        for b in (_bucket(g) for g in _grams(txt)):
            tc[b] = tc.get(b, 0) + 1
    t_total, r_total = sum(tc.values()), sum(rc.values())
    lam = {
        b: math.log((tc.get(b, 0) + ALPHA) / (t_total + ALPHA * B))
        - math.log((rc[b] + ALPHA) / (r_total + ALPHA * B))
        for b in rc
    }
    return {d: sum(lam[b] for b in bks) for d, bks in per_doc.items()}


def test_scores_match_reference_formula(raw_df, target_df):
    got = {
        r.doc_id: (r.n_grams, r.score)
        for r in dsir.dsir_scores(raw_df, target_df, n_buckets=B, alpha=ALPHA).collect()
    }
    exp = _expected_scores()
    assert set(got) == set(exp)
    for d, (n, s) in got.items():
        assert n == len(_grams(dict(RAW)[d]))
        assert abs(s - exp[d]) < 1e-9, d


def test_target_like_docs_outrank_offtopic(raw_df, target_df):
    """Docs sharing the target's vocabulary must beat the cat/dog docs —
    the selection-pressure property the method exists for."""
    top = dsir.dsir_select(raw_df, target_df, k=3, n_buckets=B).collect()
    assert {r.doc_id for r in top} == {1, 3, 5}


def test_select_is_deterministic_and_rounded(raw_df, target_df):
    a = [(r.doc_id, r.score) for r in dsir.dsir_select(raw_df, target_df, k=5).collect()]
    b = [(r.doc_id, r.score) for r in dsir.dsir_select(raw_df, target_df, k=5).collect()]
    assert a == b
    assert all(round(s, 6) == s for _, s in a)


def test_empty_and_single_token_docs(spark, target_df):
    raw = spark.createDataFrame(
        [(1, "spark"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    out = dsir.dsir_scores(raw, target_df, n_buckets=B).collect()
    # blank docs carry no grams → absent; single-token doc has 1 unigram
    assert {r.doc_id for r in out} == {1}
    assert out[0].n_grams == 1


def test_plan_stays_broadcast_and_bounded(raw_df, target_df):
    """The λ-table join must be a broadcast hash join (the model is ≤ B
    rows) — never a shuffle of the gram stream against it."""
    plan = dsir.dsir_scores(raw_df, target_df, n_buckets=B)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # r14: the scalar totals fold into the driver-built λ LocalRelation —
    # no nested-loop crossJoins remain in the scoring plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LocalTableScan" in plan  # the λ model rides as a LocalRelation
