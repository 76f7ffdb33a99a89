"""Golden end-to-end test: replay the reference pipeline semantics
(A1→A2→J4→P4→J5, SURVEY.md §5.2) on synthetic reference-shaped data and
compare against an independent pandas re-execution of the same semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.plans.pipeline import run_reference_pipeline
from pwhl_data_engineering_pipeline_spark.quality import Contract
from pwhl_data_engineering_pipeline_spark import schemas

MARKETS = [
    ("BOS_01", "Boston", "Boston Arena", "US", 42.36, -71.06, "America/New_York"),
    ("MTL_01", "Montreal", "Montreal Arena", "CA", 45.50, -73.57, "America/Toronto"),
]
DATES = ["1/1/2025", "1/2/2025", "1/3/2025"]
SECTIONS = ["Lower Bowl", "Club"]


@pytest.fixture(scope="module")
def inputs(spark):
    markets = spark.createDataFrame(MARKETS, schemas.MARKETS)

    hourly_rows = []
    for _, market, venue, *_ in MARKETS:
        for iso in ["2025-01-01", "2025-01-02", "2025-01-03"]:
            for h in range(24):
                hourly_rows.append(
                    (f"{iso}T{h:02d}:00", -2.0 + h * 0.5, 80.0, 9.0 if h < 6 else 3.0,
                     0.4 if h % 8 == 0 else 0.0, market, venue)
                )
    hourly = spark.createDataFrame(hourly_rows, schemas.WEATHER_HOURLY_RAW)

    sales_rows = []
    for i, d in enumerate(DATES):
        for j, s in enumerate(SECTIONS):
            for k in range(3):  # 3 transactions per (date, section)
                price, n = 50.0 + 5 * j, 2 + k
                sales_rows.append(
                    (d, f"  {s.lower()}  ", "5", "10", str(price), "Online",
                     f"ACCT{i}{j}{k}", str(n), str(round(price * n, 2)))
                )
    sales = spark.createDataFrame(sales_rows, schemas.TICKET_SALES_RAW)

    cap_rows = [(d, s, str(100 * (1 + SECTIONS.index(s)))) for d in DATES for s in SECTIONS]
    capacity = spark.createDataFrame(cap_rows, schemas.SECTION_CAPACITY_RAW)
    return hourly, sales, capacity, markets


def test_pipeline_end_to_end(spark, inputs):
    hourly, sales, capacity, markets = inputs
    fact = run_reference_pipeline(
        spark, hourly, sales, capacity, markets, Contract(mode="strict")
    )
    rows = {
        (r["event_date"].isoformat(), r["market"], r["section"]): r
        for r in fact.collect()
    }
    # grain: 3 dates × 2 markets × 2 sections
    assert len(rows) == 12

    # independent pandas recomputation of one cell
    # sales for one (date, section): 3 txns prices 50, n = 2,3,4 → tickets 9
    r = rows[("2025-01-01", "Boston", "Lower Bowl")]
    assert r["tickets_sold"] == 2 + 3 + 4
    assert r["revenue"] == pytest.approx(50.0 * (2 + 3 + 4))
    assert r["avg_price"] == pytest.approx(50.0)
    assert r["section_capacity"] == 100
    assert r["utilization"] == pytest.approx(9 / 100)

    # weather join: avg temp of -2.0 + h*0.5 over 24h = -2 + 0.5*11.5 = 3.75
    assert r["avg_temp_c"] == pytest.approx(3.75)
    assert r["min_temp_c"] == pytest.approx(-2.0)
    assert r["max_temp_c"] == pytest.approx(9.5)
    assert r["windy_hours"] == 6      # wind 9.0 ≥ 8 for h<6
    assert r["rainy_hours"] == 3      # h in {0,8,16}
    assert r["freezing_hours"] == 5   # -2+0.5h ≤ 0 → h ≤ 4
    assert r["hours_observed"] == 24

    # club section: price 55, capacity 200
    r2 = rows[("2025-01-02", "Montreal", "Club")]
    assert r2["tickets_sold"] == 9
    assert r2["revenue"] == pytest.approx(55.0 * 9)
    assert r2["utilization"] == pytest.approx(9 / 200)


def test_pipeline_pandas_differential(spark, inputs):
    """Full-frame differential: engine fact == independent pandas pipeline."""
    hourly, sales, capacity, markets = inputs
    fact = run_reference_pipeline(spark, hourly, sales, capacity, markets, Contract(mode="off"))
    got = (
        fact.select("event_date", "market", "section", "tickets_sold", "revenue",
                    "section_capacity", "utilization", "avg_temp_c", "hours_observed")
        .toPandas()
        .sort_values(["event_date", "market", "section"])
        .reset_index(drop=True)
    )

    # pandas re-execution (independent code path, same semantics)
    sp = sales.toPandas()
    sp["event_date"] = pd.to_datetime(sp["event_date"], format="%m/%d/%Y").dt.date
    sp["section"] = sp["section"].str.strip().str.replace(r"\s+", " ", regex=True).str.title()
    for c, t in [("ticket_price", float), ("num_tickets", "Int64"), ("total_spend", float)]:
        sp[c] = pd.to_numeric(sp[c], errors="coerce").astype(t)
    mk = markets.toPandas()[["market", "venue_id", "venue"]]
    sp = sp.merge(mk, how="cross")
    agg = (
        sp.groupby(["event_date", "market", "venue_id", "venue", "section"], as_index=False)
        .agg(tickets_sold=("num_tickets", "sum"), revenue=("total_spend", "sum"))
    )
    cp = capacity.toPandas()
    cp["event_date"] = pd.to_datetime(cp["event_date"], format="%m/%d/%Y").dt.date
    cp["section"] = cp["section"].str.strip().str.title()
    cp["section_capacity"] = pd.to_numeric(cp["section_capacity"]).astype("Int64")
    cp = cp.merge(mk, how="cross")
    f = agg.merge(cp, on=["event_date", "market", "venue_id", "venue", "section"], how="left")
    f["utilization"] = f["tickets_sold"] / f["section_capacity"]

    wx = hourly.toPandas()
    wx["time"] = pd.to_datetime(wx["time"])
    wx["event_date"] = wx["time"].dt.date
    daily = (
        wx.groupby(["event_date", "market"], as_index=False)
        .agg(avg_temp_c=("temperature_2m", "mean"), hours_observed=("time", "count"))
    )
    daily["avg_temp_c"] = daily["avg_temp_c"].round(2)
    f = f.merge(daily, on=["event_date", "market"], how="left")
    exp = f.sort_values(["event_date", "market", "section"]).reset_index(drop=True)

    assert len(got) == len(exp)
    for i in range(len(got)):
        g, e = got.iloc[i], exp.iloc[i]
        assert (g["event_date"], g["market"], g["section"]) == (
            e["event_date"], e["market"], e["section"]
        )
        assert g["tickets_sold"] == e["tickets_sold"]
        assert g["revenue"] == pytest.approx(e["revenue"])
        assert g["section_capacity"] == e["section_capacity"]
        assert g["utilization"] == pytest.approx(e["utilization"])
        assert g["avg_temp_c"] == pytest.approx(e["avg_temp_c"])
        assert g["hours_observed"] == e["hours_observed"]


def test_star_layer_and_eda(spark, inputs):
    from pwhl_data_engineering_pipeline_spark.plans import star

    hourly, sales, capacity, markets = inputs
    run_reference_pipeline(spark, hourly, sales, capacity, markets, Contract(mode="off"))
    # views registered by the pipeline; every EDA query must run and return rows
    for name in star.EDA_QUERIES:
        out = star.run_eda(spark, name)
        assert out.count() > 0, name
    # weather_id repair: fact and dim join on the minted key
    joined = spark.sql(
        "SELECT count(*) AS n FROM fact_ticket_sales f JOIN dim_weather w USING (weather_id)"
    ).collect()[0]["n"]
    assert joined == 12
