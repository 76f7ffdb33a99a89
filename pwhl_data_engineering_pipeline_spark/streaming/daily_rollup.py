"""Streaming daily weather rollup — the incremental form of plans.weather
.daily_rollup (SURVEY.md §2.10: A1 is the natural streaming candidate).

``readStream`` over a landing directory → watermarked 1-day tumbling window
keyed by venue → append-mode sink. Late hourly readings inside the watermark
update their day; beyond it they're dropped deterministically — the
streaming contract the batch reference never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import flag

HOURLY_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("market", T.StringType()),
        T.StructField("venue_id", T.StringType()),
        T.StructField("venue", T.StringType()),
        T.StructField("temp_c", T.DoubleType()),
        T.StructField("rh_pct", T.DoubleType()),
        T.StructField("wind_mps", T.DoubleType()),
        T.StructField("precip_mm", T.DoubleType()),
    ]
)


def read_hourly_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over the hourly landing zone (parquet drops)."""
    return (
        spark.readStream.schema(HOURLY_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(landing_dir)
    )


def streaming_daily_rollup(hourly: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Watermarked tumbling 1-day window per venue — same aggregate surface
    as the batch rollup (transform_weather.py:117-142)."""
    flagged = (
        hourly.withWatermark("time", watermark)
        .withColumn("windy", flag(F.col("wind_mps") >= 8.0))
        .withColumn("rainy", flag(F.col("precip_mm") > 0.0))
        .withColumn("freezing", flag(F.col("temp_c") <= 0.0))
    )
    return (
        flagged.groupBy(
            F.window("time", "1 day").alias("day_window"),
            "market", "venue_id", "venue",
        )
        .agg(
            F.round(F.avg("temp_c"), 2).alias("avg_temp_c"),
            F.round(F.min("temp_c"), 2).alias("min_temp_c"),
            F.round(F.max("temp_c"), 2).alias("max_temp_c"),
            F.round(F.avg("rh_pct"), 2).alias("avg_rh_pct"),
            F.round(F.avg("wind_mps"), 2).alias("avg_wind_mps"),
            F.round(F.sum("precip_mm"), 2).alias("total_precip_mm"),
            F.sum("windy").cast("long").alias("windy_hours"),
            F.sum("rainy").cast("long").alias("rainy_hours"),
            F.sum("freezing").cast("long").alias("freezing_hours"),
            F.count("time").cast("long").alias("hours_observed"),
        )
        .select(
            F.col("day_window.start").cast("date").alias("event_date"),
            "market", "venue_id", "venue",
            "avg_temp_c", "min_temp_c", "max_temp_c", "avg_rh_pct",
            "avg_wind_mps", "total_precip_mm",
            "windy_hours", "rainy_hours", "freezing_hours", "hours_observed",
        )
    )


def start_rollup_query(
    rollup: DataFrame, out_dir: str, checkpoint_dir: str, trigger_once: bool = True
):
    """Start the sink in append mode (finalized days only, thanks to the
    watermark). ``trigger_once`` makes it a testable incremental-batch run."""
    writer = (
        rollup.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
