"""Fact-build stage — reference scripts/integrate_weather_sales.py.

aggregated sales ⟕ capacity ⟕ daily weather → the 20-column fact at grain
(event_date × market × venue_id × venue × section).

Scale shape: the sales aggregation is the only large shuffle (keyed by the
fact grain); both joins are m:1 against dimension-sized sides (600 / 472
rows) → broadcast-hash, no second shuffle. At 100 TB the fact grain is also
the write partition key (event_date), so shuffle → write is aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import safe_divide
from ..operators.relational import join_enrich
from ..quality import Contract

GRAIN = ["event_date", "market", "venue_id", "venue", "section"]

FACT_COLS = [
    *GRAIN,
    "tickets_sold", "revenue", "avg_price", "section_capacity", "utilization",
    "avg_temp_c", "min_temp_c", "max_temp_c", "avg_rh_pct", "avg_wind_mps",
    "total_precip_mm", "windy_hours", "rainy_hours", "freezing_hours",
    "hours_observed",
]


def aggregate_sales(stamped_sales: DataFrame) -> DataFrame:
    """integrate_weather_sales.py:111-119: transactions → section grain.
    tickets_sold = sum(num_tickets), revenue = sum(total_spend),
    avg_price = mean(ticket_price)."""
    return stamped_sales.groupBy(*GRAIN).agg(
        F.sum("num_tickets").cast("long").alias("tickets_sold"),
        F.sum("total_spend").alias("revenue"),
        F.avg("ticket_price").alias("avg_price"),
    )


def build_fact(
    agg_sales: DataFrame,
    capacity: DataFrame,
    weather_daily: DataFrame,
    contract: Contract | None = None,
) -> DataFrame:
    """integrate_weather_sales.py:122-166:

    - validate capacity unique on the 5-key grain (ref :122-126, V2)
    - left join capacity (ref :129-134, m:1)
    - utilization = tickets_sold / section_capacity, NULL-safe
      (ref :137; SQL-side SAFE_DIVIDE semantics win — SURVEY.md §7.4 item 1)
    - left join daily weather on (event_date, market, venue_id, venue)
      (ref :151-160, m:1)
    - project to the 20-column load schema + sort (ref :163-166)
    """
    contract = contract or Contract(mode="warn")
    contract.require_unique_key(capacity, GRAIN, "capacity_key")

    fact = join_enrich(
        agg_sales,
        capacity.select(*GRAIN, "section_capacity"),
        GRAIN,
        "left",
        contract=contract,
        m1_keys=GRAIN,
    )
    fact = fact.withColumn("utilization", safe_divide("tickets_sold", "section_capacity"))

    wx_keys = ["event_date", "market", "venue_id", "venue"]
    weather_cols = [
        "avg_temp_c", "min_temp_c", "max_temp_c", "avg_rh_pct", "avg_wind_mps",
        "total_precip_mm", "windy_hours", "rainy_hours", "freezing_hours",
        "hours_observed",
    ]
    fact = join_enrich(
        fact,
        weather_daily.select(*wx_keys, *weather_cols),
        wx_keys,
        "left",
        contract=contract,
        m1_keys=wx_keys,
    )
    return fact.select(*FACT_COLS).orderBy("event_date", "market", "venue_id", "section")
