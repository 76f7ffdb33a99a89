"""Focused tests for the r13 optimization-round internals.

Each test pins an optimization's CONTRACT, not its speed: value identity
with the path it replaced, and the plan property that motivated it.
"""
from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import aggregates, search
from pwhl_data_engineering_pipeline_spark.sources.readers import local_frame


# -- local_frame: LocalRelation small frames ---------------------------------

_CASES = [
    # (rows, schema)
    ([("q1", "spark window agg"), ("q2", "hash join")], "query_id string, query_text string"),
    ([(0, [1.5, 2.5], True, None), (1, [0.0], False, "x")], "id long, v array<double>, f boolean, s string"),
    ([("a", datetime.date(2020, 1, 2), None), ("b", None, 3)], "k string, d date, n long"),
    ([(1, 0.25), (2, None)], "i long, x double"),
    ([], "x long, y string"),
]


@pytest.mark.parametrize("rows,schema", _CASES)
def test_local_frame_values_match_createdataframe(spark, rows, schema):
    got = sorted(map(tuple, local_frame(spark, rows, schema).collect()))
    want = sorted(map(tuple, spark.createDataFrame(rows, schema).collect()))
    assert got == want
    assert local_frame(spark, rows, schema).schema == spark.createDataFrame(rows, schema).schema


def test_local_frame_plans_as_local_relation(spark):
    df = local_frame(spark, [(1, "a")], "i long, s string")
    node = df._jdf.queryExecution().optimizedPlan().nodeName()
    # the whole point: no Python-RDD-backed LogicalRDD for literal frames
    assert node == "LocalRelation"


def test_local_frame_accepts_row_objects(spark):
    src = spark.range(3).select(F.col("id"), (F.col("id") * 2.0).alias("d"))
    rows = src.collect()
    back = local_frame(spark, rows, src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, rows))


# -- percentile range-partition sizing ----------------------------------------

def test_range_partition_count_floors_at_quarter_parallelism(spark, sf_dir):
    # r14: the floor dropped from defaultParallelism to defaultParallelism/4
    # (min 2) — small sorted inputs are per-task-overhead bound (width sweep
    # in OPTIMIZATION_r14.md); the 64 MB size term still only ever adds.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("__v")
    )
    n = aggregates._range_partition_count(li)
    assert n >= max(2, spark.sparkContext.defaultParallelism // 4)


def test_range_partition_count_scales_with_bytes(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    small = aggregates._range_partition_count(li.select("l_returnflag"))
    par = spark.sparkContext.defaultParallelism
    # tiny inputs sit at the parallelism floor; the size term only ever adds
    assert small == max(2, par // 4, small)


def test_percentiles_partition_count_is_result_invariant(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = aggregates.exact_percentiles_distributed(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.95], n_partitions=3
    )
    b = aggregates.exact_percentiles_distributed(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.95]
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# -- build_index: one exchange, doc_len without a second shuffle --------------

def test_build_index_single_exchange(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings, _ = search.build_index(docs)
    plan = postings._jdf.queryExecution().executedPlan().toString()
    # one hash distribution by doc_id serves the tf grouping AND the
    # doc_len window: exactly ONE shuffle below the postings frame
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(doc_id" in plan


def test_build_index_doc_len_still_sums_tf(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    postings, _ = search.build_index(docs)
    bad = (
        postings.groupBy("doc_id")
        .agg(F.sum("tf").alias("s"), F.min("doc_len").alias("lo"), F.max("doc_len").alias("hi"))
        .filter((F.col("s") != F.col("lo")) | (F.col("lo") != F.col("hi")))
        .count()
    )
    assert bad == 0
