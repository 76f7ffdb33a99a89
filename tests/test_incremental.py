"""Incremental day-partition loading: only newly-arrived days are
reprocessed; already-loaded partitions survive untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.streaming import incremental


def _agg(batch):
    return (
        batch.withColumn("event_date", F.col("ts").cast("date"))
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )


def test_incremental_day_load(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")

    day1 = spark.createDataFrame(
        [("2025-01-01 10:00:00", 1.0), ("2025-01-01 11:00:00", 2.0)], "ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    day1.coalesce(1).write.mode("overwrite").parquet(landing)

    q = incremental.incremental_daily_load(spark, landing, out, ckpt, day1.schema, _agg)
    q.awaitTermination(120)
    first = {r["event_date"].isoformat(): (r["n"], r["total"]) for r in spark.read.parquet(out).collect()}
    assert first == {"2025-01-01": (2, 3.0)}

    # new file: one more day-1 row (late data) + a day-2 row
    more = spark.createDataFrame(
        [("2025-01-01 12:00:00", 10.0), ("2025-01-02 09:00:00", 5.0)], "ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    more.coalesce(1).write.mode("append").parquet(landing)

    q2 = incremental.incremental_daily_load(spark, landing, out, ckpt, day1.schema, _agg)
    q2.awaitTermination(120)
    after = {r["event_date"].isoformat(): (r["n"], r["total"]) for r in spark.read.parquet(out).collect()}
    # day-2 appears; day-1 partition was overwritten by the batch containing
    # ONLY the new file's rows — documenting the per-partition overwrite
    # semantics: late data replaces, it does not merge (merge needs a
    # read-modify-write in the upsert fn or a Delta-style sink)
    assert after["2025-01-02"] == (1, 5.0)
    assert after["2025-01-01"] == (1, 10.0)


def test_incremental_day_load_with_merge(spark, tmp_path):
    """merge mode: a day whose files span batches ACCUMULATES instead of
    being replaced by the last batch's partial aggregate."""
    landing = str(tmp_path / "landing_m")
    out = str(tmp_path / "warehouse_m")
    ckpt = str(tmp_path / "ckpt_m")

    def _merge(existing, new):
        return (
            existing.unionByName(new)
            .groupBy("event_date")
            .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        )

    day1 = spark.createDataFrame(
        [("2025-01-01 10:00:00", 1.0), ("2025-01-01 11:00:00", 2.0)], "ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    day1.coalesce(1).write.mode("overwrite").parquet(landing)
    q = incremental.incremental_daily_load(
        spark, landing, out, ckpt, day1.schema, _agg, merge=_merge
    )
    q.awaitTermination(120)

    more = spark.createDataFrame(
        [("2025-01-01 12:00:00", 10.0), ("2025-01-02 09:00:00", 5.0)], "ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    more.coalesce(1).write.mode("append").parquet(landing)
    q2 = incremental.incremental_daily_load(
        spark, landing, out, ckpt, day1.schema, _agg, merge=_merge
    )
    q2.awaitTermination(120)

    after = {
        r["event_date"].isoformat(): (r["n"], r["total"])
        for r in spark.read.parquet(out).collect()
    }
    assert after["2025-01-01"] == (3, 13.0)  # merged, not replaced
    assert after["2025-01-02"] == (1, 5.0)
