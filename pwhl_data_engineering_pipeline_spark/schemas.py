"""Explicit StructType schemas for every table the engine touches.

The reference infers schemas on every CSV read and then validates/coerces
(scripts/clean_ticket_sales.py:75,80-88; scripts/load_to_bq.py:66-87). The
engine never infers in production paths: schemas are declared here once and
readers apply them (SURVEY.md §1.3). Testdata schemas mirror FIXTURES.md §3.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference-domain tables (FIXTURES.md §1-2; load schema scripts/load_to_bq.py:66-87)
# --------------------------------------------------------------------------

TICKET_SALES_RAW = T.StructType(
    [
        T.StructField("event_date", T.StringType()),  # raw M/D/YYYY or ISO; parsed downstream
        T.StructField("section", T.StringType()),
        T.StructField("row", T.StringType()),
        T.StructField("seat", T.StringType()),
        T.StructField("ticket_price", T.StringType()),
        T.StructField("purchase_channel", T.StringType()),
        T.StructField("acct_id", T.StringType()),
        T.StructField("num_tickets", T.StringType()),
        T.StructField("total_spend", T.StringType()),
    ]
)

SECTION_CAPACITY_RAW = T.StructType(
    [
        T.StructField("event_date", T.StringType()),
        T.StructField("section", T.StringType()),
        T.StructField("section_capacity", T.StringType()),
    ]
)

WEATHER_HOURLY_RAW = T.StructType(
    [
        T.StructField("time", T.StringType()),
        T.StructField("temperature_2m", T.DoubleType()),
        T.StructField("relative_humidity_2m", T.DoubleType()),
        T.StructField("wind_speed_10m", T.DoubleType()),
        T.StructField("precipitation", T.DoubleType()),
        T.StructField("market", T.StringType()),
        T.StructField("venue", T.StringType()),
    ]
)

MARKETS = T.StructType(
    [
        T.StructField("venue_id", T.StringType()),
        T.StructField("market", T.StringType()),
        T.StructField("venue", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("timezone", T.StringType()),
    ]
)

WEATHER_HOURLY_TIDY = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("event_date", T.DateType()),
        T.StructField("market", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("venue_id", T.StringType()),
        T.StructField("venue", T.StringType()),
        T.StructField("temp_c", T.DoubleType()),
        T.StructField("rh_pct", T.DoubleType()),
        T.StructField("wind_mps", T.DoubleType()),
        T.StructField("precip_mm", T.DoubleType()),
    ]
)

WEATHER_DAILY = T.StructType(
    [
        T.StructField("event_date", T.DateType()),
        T.StructField("market", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("venue_id", T.StringType()),
        T.StructField("venue", T.StringType()),
        T.StructField("avg_temp_c", T.DoubleType()),
        T.StructField("min_temp_c", T.DoubleType()),
        T.StructField("max_temp_c", T.DoubleType()),
        T.StructField("avg_rh_pct", T.DoubleType()),
        T.StructField("avg_wind_mps", T.DoubleType()),
        T.StructField("total_precip_mm", T.DoubleType()),
        T.StructField("windy_hours", T.LongType()),
        T.StructField("rainy_hours", T.LongType()),
        T.StructField("freezing_hours", T.LongType()),
        T.StructField("hours_observed", T.LongType()),
    ]
)

# Final fact — the 20-column load schema (scripts/load_to_bq.py:66-87).
FACT_TICKET_SALES_WITH_WEATHER = T.StructType(
    [
        T.StructField("event_date", T.DateType(), nullable=False),
        T.StructField("market", T.StringType()),
        T.StructField("venue_id", T.StringType()),
        T.StructField("venue", T.StringType()),
        T.StructField("section", T.StringType()),
        T.StructField("tickets_sold", T.LongType()),
        T.StructField("revenue", T.DoubleType()),
        T.StructField("avg_price", T.DoubleType()),
        T.StructField("section_capacity", T.LongType()),
        T.StructField("utilization", T.DoubleType()),
        T.StructField("avg_temp_c", T.DoubleType()),
        T.StructField("min_temp_c", T.DoubleType()),
        T.StructField("max_temp_c", T.DoubleType()),
        T.StructField("avg_rh_pct", T.DoubleType()),
        T.StructField("avg_wind_mps", T.DoubleType()),
        T.StructField("total_precip_mm", T.DoubleType()),
        T.StructField("windy_hours", T.LongType()),
        T.StructField("rainy_hours", T.LongType()),
        T.StructField("freezing_hours", T.LongType()),
        T.StructField("hours_observed", T.LongType()),
    ]
)

# --------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/ — FIXTURES.md §3)
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

REGION = T.StructType(
    [T.StructField("r_regionkey", T.IntegerType()), T.StructField("r_name", T.StringType())]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
