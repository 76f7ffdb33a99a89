"""Weather transform stage — reference scripts/transform_weather.py.

hourly raw → tidy (rename/parse/enrich with market dim) → daily rollup.
Spark-first: the m:1 market enrichment is a broadcast join; the daily rollup
is one hash-agg keyed by (event_date, market, country, venue_id, venue) —
partial aggregation makes it one shuffle of partial states, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import flag, round2_half_even, slugify, to_timestamp_coerce
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


def daily_rollup(tidy: DataFrame, parity: str = "native") -> DataFrame:
    """transform_weather.py:117-142: hourly tidy → daily per-venue features.

    Boolean hour flags (windy/rainy/freezing) are cast to int and summed;
    float outputs rounded to 2 dp with HALF-EVEN (pandas .round parity,
    ref :141-142).

    ``parity="pandas"`` computes each group with pandas itself
    (applyInPandas over time-sorted rows) so results are BIT-IDENTICAL to
    the reference's pandas pipeline — including means whose true value sits
    exactly on a .005 rounding boundary, where Spark's partial-sum order
    and pandas' pairwise summation legitimately land on opposite sides.
    Use it for migration sign-off (verified byte-exact against the
    reference's committed goldens in tests/test_reference_golden.py);
    ``native`` is the production path (pure JVM, partial aggregation).
    """
    if parity == "pandas":
        return _daily_rollup_pandas_parity(tidy)
    flagged = (
        tidy.withColumn("windy", flag(F.col("wind_mps") >= 8.0))
        .withColumn("rainy", flag(F.col("precip_mm") > 0.0))
        .withColumn("freezing", flag(F.col("temp_c") <= 0.0))
    )
    out = flagged.groupBy("event_date", "market", "country", "venue_id", "venue").agg(
        round2_half_even(F.avg("temp_c")).alias("avg_temp_c"),
        round2_half_even(F.min("temp_c")).alias("min_temp_c"),
        round2_half_even(F.max("temp_c")).alias("max_temp_c"),
        round2_half_even(F.avg("rh_pct")).alias("avg_rh_pct"),
        round2_half_even(F.avg("wind_mps")).alias("avg_wind_mps"),
        round2_half_even(F.sum("precip_mm")).alias("total_precip_mm"),
        F.sum("windy").cast("long").alias("windy_hours"),
        F.sum("rainy").cast("long").alias("rainy_hours"),
        F.sum("freezing").cast("long").alias("freezing_hours"),
        F.count("time").cast("long").alias("hours_observed"),
    )
    return out.orderBy("market", "venue_id", "event_date")


def _daily_rollup_pandas_parity(tidy: DataFrame) -> DataFrame:
    """Distributed-but-pandas-exact rollup: one pandas computation per
    (day, venue) group, mirroring transform_weather.py:117-142 literally."""
    from .. import schemas

    def agg(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("time")
        first = pdf.iloc[0]

        def seq_sum(s):
            # pandas groupby().mean()/sum() use KAHAN-COMPENSATED summation
            # in the Cython grouped path (group_mean/group_add) — neither
            # plain sequential nor numpy pairwise. On .005-boundary values
            # the three algorithms yield different last-ulp doubles and
            # hence different rounded output; the reference aggregated via
            # groupby, so compensated it is (verified against the goldens).
            t = 0.0
            comp = 0.0
            for v in s.to_numpy():
                y = float(v) - comp
                hi = t + y
                comp = (hi - t) - y
                t = hi
            return t

        n = len(pdf)
        return pd.DataFrame(
            [
                {
                    "event_date": first["event_date"],
                    "market": first["market"],
                    "country": first["country"],
                    "venue_id": first["venue_id"],
                    "venue": first["venue"],
                    "avg_temp_c": np.round(seq_sum(pdf["temp_c"]) / n, 2),
                    "min_temp_c": np.round(pdf["temp_c"].min(), 2),
                    "max_temp_c": np.round(pdf["temp_c"].max(), 2),
                    "avg_rh_pct": np.round(seq_sum(pdf["rh_pct"]) / n, 2),
                    "avg_wind_mps": np.round(seq_sum(pdf["wind_mps"]) / n, 2),
                    "total_precip_mm": np.round(seq_sum(pdf["precip_mm"]), 2),
                    "windy_hours": int((pdf["wind_mps"] >= 8.0).sum()),
                    "rainy_hours": int((pdf["precip_mm"] > 0.0).sum()),
                    "freezing_hours": int((pdf["temp_c"] <= 0.0).sum()),
                    "hours_observed": n,
                }
            ]
        )

    return tidy.groupBy(
        "event_date", "market", "country", "venue_id", "venue"
    ).applyInPandas(agg, schemas.WEATHER_DAILY)
