"""Ultimate parity check: run the engine pipeline on the REFERENCE'S OWN raw
data (read at runtime from /root/reference — never copied) and reproduce its
committed golden outputs row for row.

Golden files (reference's own committed intermediates/outputs):
- data/cleaned/fact_ticket_sales_with_weather.csv (600 rows, 20 cols)
- data/cleaned/weather_daily_by_venue.csv (472 rows)
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pwhl_data_engineering_pipeline_spark import schemas
from pwhl_data_engineering_pipeline_spark.plans.pipeline import run_reference_pipeline
from pwhl_data_engineering_pipeline_spark.quality import Contract
from pwhl_data_engineering_pipeline_spark.sources import readers

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/data/raw"), reason="reference checkout not available"
)

FACT_KEY = ["event_date", "market", "venue_id", "venue", "section"]


@pytest.fixture(scope="module")
def fact(spark):
    hourly = readers.read_csv(
        spark, f"{REF}/data/raw/weather/weather_hourly_2025-01_2025-02.csv",
        schemas.WEATHER_HOURLY_RAW,
    )
    sales = readers.read_csv(
        spark, f"{REF}/data/raw/pwhl_ticket_sales.csv", schemas.TICKET_SALES_RAW
    )
    capacity = readers.read_csv(
        spark, f"{REF}/data/raw/game_section_capacity.csv", schemas.SECTION_CAPACITY_RAW
    )
    markets = readers.read_markets_yaml(spark, f"{REF}/config/markets.yml", schemas.MARKETS)
    return run_reference_pipeline(
        spark, hourly, sales, capacity, markets, Contract(mode="strict"),
        weather_parity="pandas",
    )


def test_fact_matches_reference_golden(spark, fact):
    got = fact.toPandas()
    got["event_date"] = got["event_date"].astype(str)
    got = got.sort_values(FACT_KEY).reset_index(drop=True)

    exp = pd.read_csv(f"{REF}/data/cleaned/fact_ticket_sales_with_weather.csv")
    exp = exp.sort_values(FACT_KEY).reset_index(drop=True)

    assert len(got) == len(exp) == 600
    assert list(got.columns) == list(exp.columns)

    for c in FACT_KEY:
        assert (got[c].astype(str) == exp[c].astype(str)).all(), f"key col {c} differs"
    int_cols = ["tickets_sold", "section_capacity", "windy_hours", "rainy_hours",
                "freezing_hours", "hours_observed"]
    for c in int_cols:
        assert (got[c].astype("int64") == exp[c].astype("int64")).all(), f"{c} differs"
    # weather columns are 2-dp rounded with pandas parity → byte-exact
    for c in ["avg_temp_c", "min_temp_c", "max_temp_c", "avg_rh_pct",
              "avg_wind_mps", "total_precip_mm"]:
        assert (got[c].astype(float) == exp[c].astype(float)).all(), f"{c} differs"
    # unrounded money/ratio columns: relative tolerance covers the legitimate
    # fp accumulation-order delta between Spark partial sums and pandas sums
    for c in ["revenue", "avg_price", "utilization"]:
        g, e = got[c].astype(float), exp[c].astype(float)
        rel = ((g - e).abs() / (1.0 + e.abs())).max()
        assert rel < 1e-12, f"{c} max rel diff {rel}"


def test_known_good_aggregates(spark, fact):
    """BASELINE.md's published known-good aggregates (reference README.md:
    287,311-330) must come out of the engine's star layer on the real data:
    per-section revenue/avg-price table and the ≈0.597 avg utilization."""
    from pyspark.sql import functions as F

    by_section = {
        r["section"]: r
        for r in fact.groupBy("section")
        .agg(
            F.sum("revenue").alias("total_revenue"),
            F.avg("avg_price").alias("mean_avg_price"),
        )
        .collect()
    }
    expected_revenue = {
        # README.md:311 prints 15,346,680 but the reference's OWN committed
        # fact sums to 15,364,680 (digit transposition in their docs; the
        # engine — byte-identical to their data — agrees with the data).
        "Upper Bowl": 15_364_680.0,
        "Lower Bowl": 14_890_120.0,
        "Club": 6_350_640.0,
        "Suite": 4_476_240.0,
        "Standing Room": 2_098_720.0,
    }
    for section, rev in expected_revenue.items():
        assert by_section[section]["total_revenue"] == pytest.approx(rev, rel=1e-9), section
    # README.md:311-315 avg price per section
    assert by_section["Upper Bowl"]["mean_avg_price"] == pytest.approx(75.47, abs=0.01)
    assert by_section["Standing Room"]["mean_avg_price"] == pytest.approx(76.77, abs=0.01)

    avg_util = fact.agg(F.avg("utilization").alias("u")).collect()[0]["u"]
    assert avg_util == pytest.approx(0.597, abs=0.001)  # README.md:287

    # per-market temp↔utilization correlations (README.md:323-330 extremes)
    corr = {
        r["market"]: r["c"]
        for r in fact.groupBy("market")
        .agg(F.corr("utilization", "avg_temp_c").alias("c"))
        .collect()
    }
    assert corr["Boston"] == pytest.approx(0.368, abs=0.01)
    assert corr["Minneapolis"] == pytest.approx(-0.067, abs=0.01)


def test_weather_daily_matches_reference_golden(spark):
    from pwhl_data_engineering_pipeline_spark.plans import weather as weather_stage

    hourly = readers.read_csv(
        spark, f"{REF}/data/raw/weather/weather_hourly_2025-01_2025-02.csv",
        schemas.WEATHER_HOURLY_RAW,
    )
    markets = readers.read_markets_yaml(spark, f"{REF}/config/markets.yml", schemas.MARKETS)
    tidy = weather_stage.tidy_hourly(hourly, markets, Contract(mode="strict"))
    daily = weather_stage.daily_rollup(tidy, parity="pandas").toPandas()
    daily["event_date"] = daily["event_date"].astype(str)
    key = ["event_date", "market", "venue_id"]
    daily = daily.sort_values(key).reset_index(drop=True)

    exp = pd.read_csv(f"{REF}/data/cleaned/weather_daily_by_venue.csv")
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(daily) == len(exp) == 472
    for c in ["avg_temp_c", "min_temp_c", "max_temp_c", "avg_rh_pct", "avg_wind_mps",
              "total_precip_mm"]:
        assert (daily[c].astype(float) == exp[c].astype(float)).all(), f"{c} differs"
    for c in ["windy_hours", "rainy_hours", "freezing_hours", "hours_observed"]:
        assert (daily[c].astype("int64") == exp[c].astype("int64")).all(), f"{c} differs"
