"""Compaction (small-files maintenance) and dynamic partition pruning."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.sources import writers


def test_compact_parquet(spark, tmp_path):
    path = str(tmp_path / "many_small")
    # 32 small files
    spark.range(10_000).repartition(32).write.mode("overwrite").parquet(path)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 32
    n = writers.compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == n == 1
    assert spark.read.parquet(path).count() == 10_000


def test_dynamic_partition_pruning(spark, tmp_path):
    """A join against a filtered dim must prune fact partitions at runtime
    (DPP) — the mechanism that makes day-partitioned facts cheap to join at
    100 TB."""
    fact_path = str(tmp_path / "fact")
    fact = spark.range(1000).select(
        (F.col("id") % 10).cast("int").alias("day_key"), F.col("id").alias("v")
    )
    fact.write.mode("overwrite").partitionBy("day_key").parquet(fact_path)
    dim = spark.createDataFrame([(1, "keep"), (2, "keep")], "day_key int, tag string")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        f = spark.read.parquet(fact_path)
        joined = f.join(dim, "day_key").agg(F.sum("v").alias("s"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(day_key" in plan
        got = joined.collect()[0]["s"]
        expected = sum(i for i in range(1000) if i % 10 in (1, 2))
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compact_parquet_on_connect_local(spark, tmp_path, monkeypatch):
    """r8: the compactor's sizing (walk_files) and crash-safe directory
    swap (delete + rename) run through fsutil's Connect-local fallbacks,
    so small-file maintenance works without a JVM handle too."""
    import os

    from pwhl_data_engineering_pipeline_spark import fsutil as _fsu
    from pwhl_data_engineering_pipeline_spark.sources import writers

    path = str(tmp_path / "cx_frag")
    spark.range(0, 20000).repartition(24).write.parquet(path)
    before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert before >= 24

    monkeypatch.setattr(_fsu, "_has_jvm", lambda s: False)
    n = writers.compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    monkeypatch.setattr(_fsu, "_has_jvm", lambda s: True)

    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(after) == n < before
    assert spark.read.parquet(path).count() == 20000
    # no swap leftovers
    assert not os.path.exists(path + "__compact_old")
    assert not os.path.exists(path + "__compact_staging")
