"""Scalar kit edge cases (SURVEY.md §7.4 traps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.functions import scalars


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_to_date_multi_formats(spark):
    df = spark.createDataFrame(
        [("1/1/2025",), ("12/31/2025",), ("2025-01-07",), ("garbage",), (None,)],
        "d string",
    )
    out = [r["p"] and r["p"].isoformat() for r in df.select(scalars.to_date_multi("d").alias("p")).collect()]
    assert out == ["2025-01-01", "2025-12-31", "2025-01-07", None, None]


def test_coerce_casts(spark):
    df = spark.createDataFrame([("4",), ("4.0",), ("x",), (None,)], "n string")
    longs = [r["v"] for r in df.select(scalars.to_long_coerce("n").alias("v")).collect()]
    assert longs == [4, 4, None, None]
    doubles = [r["v"] for r in df.select(scalars.to_double_coerce("n").alias("v")).collect()]
    assert doubles == [4.0, 4.0, None, None]


def test_slugify(spark):
    assert _one(spark, scalars.slugify(F.lit("Boston"), F.lit("PWHL Boston Arena"))) == (
        "boston_pwhl_boston_arena"
    )
    assert _one(spark, scalars.slugify(F.lit("  A--B  "))) == "a_b"


def test_safe_divide_null_on_zero(spark):
    assert _one(spark, scalars.safe_divide(F.lit(1.0), F.lit(0.0))) is None
    assert _one(spark, scalars.safe_divide(F.lit(1.0), F.lit(None).cast("double"))) is None
    assert _one(spark, scalars.safe_divide(F.lit(9.0), F.lit(3.0))) == 3.0


def test_band_null_and_bounds(spark):
    bands = [(None, 0.0, "neg"), (0.0, 10.0, "low"), (None, None, "high")]
    col = scalars.band(F.lit(None).cast("double"), bands)
    assert _one(spark, col) == "Unknown"
    assert _one(spark, scalars.band(F.lit(0.0), bands)) == "neg"  # first match wins
    assert _one(spark, scalars.band(F.lit(5.0), bands)) == "low"
    assert _one(spark, scalars.band(F.lit(11.0), bands)) == "high"


def test_portable_round(spark):
    # engine-boundary case: shortest-repr 8285.425 is binarily 8285.4249…
    assert _one(spark, scalars.portable_round(F.lit(8285.425), 2)) == 8285.42
    assert _one(spark, scalars.portable_round(F.lit(2.675), 2)) == 2.68  # binary 2.67500000000000017…
    assert _one(spark, scalars.portable_round(F.lit(None).cast("double"), 2)) is None


def test_norm_section_title_case(spark):
    df = spark.createDataFrame([("  lower   bowl ",), ("STANDING ROOM",)], "s string")
    out = [r["v"] for r in df.select(scalars.norm_section("s").alias("v")).collect()]
    assert out == ["Lower Bowl", "Standing Room"]


def test_surrogate_keys(spark):
    assert _one(spark, scalars.surrogate_key(F.lit("Boston"), F.lit("2025-01-01"))) == (
        "Boston|2025-01-01"
    )
    h1 = _one(spark, scalars.surrogate_key_hash(F.lit("a"), F.lit("b")))
    h2 = _one(spark, scalars.surrogate_key_hash(F.lit("a"), F.lit("b")))
    assert isinstance(h1, int) and h1 == h2


def test_date_kit(spark):
    d = F.to_date(F.lit("2025-01-06"))
    assert _one(spark, scalars.weekday_name(d)) == "Monday"
    assert _one(spark, scalars.iso_week(d)) == 2
    seq = _one(spark, F.size(scalars.date_sequence("2025-01-01", "2025-01-31")))
    assert seq == 31
