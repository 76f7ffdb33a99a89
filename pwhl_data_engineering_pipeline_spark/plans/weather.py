"""Weather transform stage — reference scripts/transform_weather.py.

hourly raw → tidy (rename/parse/enrich with market dim) → daily rollup.
Spark-first: the m:1 market enrichment is a broadcast join; the daily rollup
is one hash-agg keyed by (event_date, market, country, venue_id, venue) —
partial aggregation makes it one shuffle of partial states, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import flag, round2, slugify, to_timestamp_coerce
from ..operators.relational import join_enrich
from ..quality import Contract

HOURLY_RENAMES = {
    "temperature_2m": "temp_c",
    "relative_humidity_2m": "rh_pct",
    "wind_speed_10m": "wind_mps",
    "precipitation": "precip_mm",
}

TIDY_COLS = [
    "time", "event_date", "market", "country", "venue_id", "venue",
    "temp_c", "rh_pct", "wind_mps", "precip_mm",
]


def tidy_hourly(
    hourly_raw: DataFrame,
    markets: DataFrame,
    contract: Contract | None = None,
) -> DataFrame:
    """transform_weather.py:64-112 as one lazy chain.

    - parse time → timestamp, derive event_date (ref :74-75)
    - rename API columns to tidy names (ref :77-82)
    - left-join market dim on (market, venue), m:1-validated (ref :91-96)
    - fill country with "" and venue_id with slugify fallback (ref :100-102)
    - project + sort (ref :105-107)
    """
    contract = contract or Contract(mode="warn")
    contract.require_columns(
        hourly_raw, ["time", *HOURLY_RENAMES, "market", "venue"], "weather_hourly"
    )
    df = hourly_raw.withColumn("time", to_timestamp_coerce("time"))
    df = df.withColumn("event_date", F.col("time").cast("date"))
    for src, dst in HOURLY_RENAMES.items():
        df = df.withColumnRenamed(src, dst)

    mkt = markets.filter((F.col("market") != "") & (F.col("venue") != "")).select(
        "market", "venue", "country", "venue_id"
    )
    df = join_enrich(df, mkt, ["market", "venue"], "left", contract=contract, m1_keys=["market", "venue"])
    df = df.withColumn("country", F.coalesce(F.col("country"), F.lit(""))).withColumn(
        "venue_id", F.coalesce(F.col("venue_id"), slugify("market", "venue"))
    )
    return df.select(*TIDY_COLS).orderBy("market", "venue_id", "time")


def daily_rollup(tidy: DataFrame) -> DataFrame:
    """transform_weather.py:117-142: hourly tidy → daily per-venue features.

    Boolean hour flags (windy/rainy/freezing) are cast to int and summed;
    float outputs rounded to 2 dp as the reference does (ref :141-142).
    """
    flagged = (
        tidy.withColumn("windy", flag(F.col("wind_mps") >= 8.0))
        .withColumn("rainy", flag(F.col("precip_mm") > 0.0))
        .withColumn("freezing", flag(F.col("temp_c") <= 0.0))
    )
    out = flagged.groupBy("event_date", "market", "country", "venue_id", "venue").agg(
        round2(F.avg("temp_c")).alias("avg_temp_c"),
        round2(F.min("temp_c")).alias("min_temp_c"),
        round2(F.max("temp_c")).alias("max_temp_c"),
        round2(F.avg("rh_pct")).alias("avg_rh_pct"),
        round2(F.avg("wind_mps")).alias("avg_wind_mps"),
        round2(F.sum("precip_mm")).alias("total_precip_mm"),
        F.sum("windy").cast("long").alias("windy_hours"),
        F.sum("rainy").cast("long").alias("rainy_hours"),
        F.sum("freezing").cast("long").alias("freezing_hours"),
        F.count("time").cast("long").alias("hours_observed"),
    )
    return out.orderBy("market", "venue_id", "event_date")
