"""Aggregation operators — SURVEY.md §2.4 A1-A10.

All are single hash-aggregations: Catalyst plans partial (map-side) + final
stages automatically, so each costs one shuffle on its grouping key. The
named-agg style mirrors the reference's pandas named aggregations
(scripts/transform_weather.py:124-139) while keeping plans declarative.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_rollup(
    df: DataFrame,
    time_col: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
    date_col: str = "event_date",
) -> DataFrame:
    """A1: calendar-day rollup (transform_weather.py:117-142): derive the
    date from a timestamp, group by (date, keys), apply named aggregates."""
    return (
        df.withColumn(date_col, F.to_date(F.col(time_col)))
        .groupBy(date_col, *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )


def grain_rollup(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """A2/A3/A6: hash-agg to a grain with named aggregates
    (integrate_weather_sales.py:111-119; sql/02_create_dims_and_facts.sql:100-110)."""
    return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def weighted_avg(num: str | Column, den: str | Column) -> Column:
    """A3's weighted price: SAFE_DIVIDE(SUM(num), NULLIF(SUM(den),0))
    (sql/02_create_dims_and_facts.sql:106-108)."""
    n = F.col(num) if isinstance(num, str) else num
    d = F.col(den) if isinstance(den, str) else den
    return F.try_divide(F.sum(n), F.nullif(F.sum(d), F.lit(0)))


def distinct_dim(df: DataFrame, cols: Sequence[str], not_null: str | None = None) -> DataFrame:
    """A4: SELECT DISTINCT dimension extraction with optional NOT NULL key
    filter (sql/02_create_dims_and_facts.sql:21-37)."""
    out = df.select(*cols)
    if not_null:
        out = out.filter(F.col(not_null).isNotNull())
    return out.distinct()


def count_if(cond: Column) -> Column:
    """A7: COUNTIF (sql/10_eda_queries.sql:128-136)."""
    return F.count_if(cond)


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """A10: duplicate-key detection (clean_ticket_sales.py:116-119) —
    groups appearing more than once, with their multiplicities."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
