"""plans.audit: the structured plan inspector must report the same facts
the string-level plan-quality gates assert."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as em
from pwhl_data_engineering_pipeline_spark.plans.audit import audit


def test_audit_broadcast_and_pushdown(spark, sf_dir):
    a = audit(em.queries()["j1_broadcast_enrich"](spark, sf_dir))
    assert a.n_broadcast_joins == 3
    assert not a.has_cartesian
    assert a.python_free


def test_audit_pushed_filters_and_topk(spark, sf_dir):
    a = audit(em.queries()["p1_p5_filter_project"](spark, sf_dir))
    assert any("l_quantity" in f for f in a.pushed_filters)
    t = audit(em.queries()["o3_topk"](spark, sf_dir))
    assert t.has_take_ordered


def test_audit_counts_python_stages(spark, sf_dir):
    from pwhl_data_engineering_pipeline_spark.operators import dedup
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    a = audit(dedup.minhash_signature_arrow(docs))
    assert a.n_python_stages == 1


def test_audit_flags_cartesian(spark):
    left = spark.range(3)
    right = spark.range(3).withColumnRenamed("id", "id2")
    a = audit(left.crossJoin(right))
    assert a.has_cartesian
