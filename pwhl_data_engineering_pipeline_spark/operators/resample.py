"""Time-series resampling & gap filling — regularize an irregular event
stream onto a fixed grid per key (the hourly-weather shape of the reference
domain: transform_weather.py aggregates hourly readings that may have holes;
training pipelines need the same for feature grids and sensor/metric feeds).

Composition of existing primitives, two steps:

1. SPINE: per key, explode ``sequence(floor_min_ts, max_ts, step)`` — the
   complete grid. Bounds come from one cheap per-key aggregate (map-side
   combinable), so spine generation is a broadcastable frame of
   keys × grid length.
2. FILL: left-join observations onto the spine at the bucketed timestamp,
   then forward-fill with ``last(value struct, ignorenulls)`` over the key
   window — the same struct-carry trick as the as-of join, so all filled
   columns come from the same observation and a NULL-valued observation is
   carried as NULL, not skipped back over.

One shuffle for the join (spine side is usually broadcastable) + one window
on the same key — at 100 TB the window partitions by key, which is exactly
the cardinality that makes per-key state small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    step_seconds: int = 3600,
) -> DataFrame:
    """Regularize ``df`` onto a ``step_seconds`` grid per key with forward
    fill. Returns (keys..., grid_ts, *value_cols, is_observed).

    Observations are bucketed to ``floor(ts / step)``; when several land in
    one bucket the LATEST (by ts) wins — deterministic. Grid cells before a
    key's first observation stay NULL (nothing to fill from)."""
    step = F.lit(step_seconds)
    # cast-first: plain parquet timestamps read as TIMESTAMP_NTZ (Spark 4),
    # which unix_timestamp rejects; session TZ is pinned UTC so the cast is
    # wall-clock-preserving.
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    bucket = (F.floor(epoch / step) * step).cast("long")

    # latest observation per (key, bucket): struct carry keeps columns together
    w_latest = Window.partitionBy(*keys, "__bucket").orderBy(F.col(ts_col).desc())
    obs = (
        df.withColumn("__bucket", bucket)
        .withColumn("__rn", F.row_number().over(w_latest))
        .filter(F.col("__rn") == 1)
        .select(
            *keys,
            "__bucket",
            F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
        )
    )

    bounds = df.groupBy(*keys).agg(
        (F.floor(F.min(epoch) / step) * step).cast("long").alias("__lo"),
        (F.floor(F.max(epoch) / step) * step).cast("long").alias("__hi"),
    )
    spine = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias("__bucket"),
    )

    joined = spine.join(obs, [*keys, "__bucket"], "left")
    w_fill = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        *keys,
        F.timestamp_seconds(F.col("__bucket")).alias("grid_ts"),
        F.last(F.col("__v"), ignorenulls=True).over(w_fill).alias("__f"),
        F.col("__v").isNotNull().alias("is_observed"),
    )
    return filled.select(
        *keys,
        "grid_ts",
        *[F.col("__f")[c].alias(c) for c in value_cols],
        "is_observed",
    )
