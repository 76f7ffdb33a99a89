"""Z-order layout: multi-column clustering measurably tightens per-file
min/max stats on the SECOND dimension (the one lexicographic sort leaves
unclustered), which is what lets parquet row-group pruning work for filters
on either column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.functions import zorder


def _per_file_span(path_glob: str, col: str) -> float:
    """Mean (max-min) of `col` across parquet files, from footer stats."""
    spans = []
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append(float(hi - lo))
    return sum(spans) / len(spans)


def test_interleave_bits_known_values(spark):
    df = spark.range(1).select(
        zorder.interleave_bits([F.lit(0b11).cast("long"), F.lit(0b00).cast("long")], bits=2).alias("z"),
        zorder.interleave_bits([F.lit(0b10).cast("long"), F.lit(0b01).cast("long")], bits=2).alias("z2"),
    )
    r = df.collect()[0]
    # cols (a,b): bit i of col j -> position i*2+j; a=11,b=00 -> 0b0101 = 5
    assert r["z"] == 0b0101
    # a=10,b=01 -> a0=0@0, b0=1@1, a1=1@2, b1=0@3 -> 0b0110 = 6
    assert r["z2"] == 0b0110


def test_interleave_bits_overflow_guard(spark):
    import pytest

    cols = [F.lit(1).cast("long")] * 5
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder.interleave_bits(cols, bits=16)
    # zorder_key auto-shrinks instead of raising: 5 cols -> 12 bits each
    df = spark.createDataFrame([(1.0, 2.0, 3.0, 4.0, 5.0)], "a double, b double, c double, d double, e double")
    key = zorder.zorder_key(df, ["a", "b", "c", "d", "e"], bits=16)
    assert df.select(key.alias("z")).collect()[0]["z"] >= 0


def test_quantize_nulls_at_origin(spark):
    """Docstring contract: NULLs cluster at the curve ORIGIN (0), not at the
    end — least/greatest skip NULL inputs so the clamp must coalesce first."""
    df = spark.createDataFrame([(None,), (0.0,), (100.0,)], "x double")
    got = [r["q"] for r in df.select(zorder.quantize(F.col("x"), 0.0, 100.0, 8).alias("q")).collect()]
    assert got == [0, 0, 255]


def test_zorder_tightens_second_dim(spark, tmp_path):
    # two independent uniform dims
    df = spark.range(40000).select(
        (F.xxhash64("id") % 1000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("b"),
    ).withColumn("a", F.abs("a")).withColumn("b", F.abs("b"))

    lex = str(tmp_path / "lex")
    zed = str(tmp_path / "zed")
    (df.repartitionByRange(16, "a").sortWithinPartitions("a", "b")
       .write.mode("overwrite").parquet(lex))
    zorder.write_zordered(df, zed, ["a", "b"], n_files=16)

    # first dim: lexicographic is perfectly clustered; z-order trades some of
    # that away...
    span_b_lex = _per_file_span(f"{lex}/part-*.parquet", "b")
    span_b_zed = _per_file_span(f"{zed}/part-*.parquet", "b")
    # ...to make the second dim prunable: per-file b-span must shrink a lot
    assert span_b_zed < span_b_lex * 0.6, (span_b_zed, span_b_lex)
    # and the z files still cluster a far better than random (full span ~1000)
    span_a_zed = _per_file_span(f"{zed}/part-*.parquet", "a")
    assert span_a_zed < 1000 * 0.6
