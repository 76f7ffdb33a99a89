"""Section-capacity cleaning stage — reference scripts/clean_section_capacity.py.

capacity raw (75 rows) → cleaned → replicated ×8 markets (cross join,
ref :105-108) → 600-row capacity dimension at grain
(event_date, market, venue_id, venue, section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import norm_section, to_date_multi, to_long_coerce
from ..quality import Contract

OUT_COLS = ["event_date", "market", "venue_id", "venue", "section", "section_capacity"]


def clean_capacity(raw: DataFrame, contract: Contract | None = None) -> DataFrame:
    """clean_section_capacity.py:83-103: parse dates (dual format), normalize
    section, coerce capacity to nullable int, null-rate sanity logging."""
    contract = contract or Contract(mode="warn")
    contract.require_columns(raw, ["event_date", "section", "section_capacity"], "capacity")
    df = (
        raw.withColumn("event_date", to_date_multi("event_date"))
        .withColumn("section", norm_section("section"))
        .withColumn("section_capacity", to_long_coerce("section_capacity"))
    )
    contract.check_null_rate(df, ["event_date", "section_capacity"], "capacity_nulls")
    return df


def replicate_per_market(capacity: DataFrame, markets: DataFrame) -> DataFrame:
    """clean_section_capacity.py:105-112: cross join ×markets + project + sort.
    The market side is 8 rows — broadcast, no shuffle of the capacity side."""
    mkt = markets.select("market", "venue_id", "venue")
    return (
        capacity.crossJoin(F.broadcast(mkt))
        .select(*OUT_COLS)
        .orderBy("event_date", "market", "section")
    )
