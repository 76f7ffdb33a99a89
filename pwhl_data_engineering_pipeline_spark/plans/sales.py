"""Ticket-sales cleaning stage — reference scripts/clean_ticket_sales.py.

Raw transactions → typed/normalized rows → per-market stamped replication.
The reference deliberately stamps the SAME base transactions onto every
market (ref :133-150, synthetic replication admitted at README.md:287,335);
we reproduce that as a broadcast cross join — do not "fix" it
(SURVEY.md §7.4 item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import (
    clean_string,
    norm_section,
    round2,
    to_date_multi,
    to_double_coerce,
    to_long_coerce,
)
from ..quality import Contract

REQUIRED = [
    "event_date", "section", "ticket_price", "purchase_channel",
    "acct_id", "num_tickets", "total_spend",
]


def clean_sales(raw: DataFrame, contract: Contract | None = None) -> DataFrame:
    """clean_ticket_sales.py:75-101: normalize + coerce + integrity-check.

    - normalize string cols (trim/collapse), title-case section (ref :38-41,92-93)
    - dual-format date parse (ref :91; M/D/YYYY raw per data/raw/...csv:2)
    - coerce numerics (ref :94-95)
    - cross-field integrity: total_spend ≈ round(price × tickets, 2)
      (ref :97-101, warn-only)
    """
    contract = contract or Contract(mode="warn")
    contract.require_columns(raw, REQUIRED, "ticket_sales")
    df = (
        raw.withColumn("event_date", to_date_multi("event_date"))
        .withColumn("section", norm_section("section"))
        .withColumn("purchase_channel", clean_string("purchase_channel"))
        .withColumn("acct_id", clean_string("acct_id"))
        .withColumn("ticket_price", to_double_coerce("ticket_price"))
        .withColumn("num_tickets", to_long_coerce("num_tickets"))
        .withColumn("total_spend", to_double_coerce("total_spend"))
    )
    df = df.withColumn("calc_spend", round2(F.col("ticket_price") * F.col("num_tickets")))
    contract.check_integrity(
        df,
        F.abs(F.col("total_spend") - F.col("calc_spend")) < 0.01,
        name="total_spend_integrity",
    )
    return df.drop("calc_spend")


def stamp_markets(clean: DataFrame, markets: DataFrame) -> DataFrame:
    """clean_ticket_sales.py:133-150: replicate cleaned transactions per
    market (stamp market/venue_id/venue). The reference loops markets and
    concatenates per-market copies — semantically a cross join against the
    market dim, which is what we emit (broadcast: 8 rows)."""
    mkt = markets.select("market", "venue_id", "venue")
    return clean.crossJoin(F.broadcast(mkt))
