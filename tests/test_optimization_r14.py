"""Round-14 optimization pins: each test freezes a fix's contract so a
refactor can't silently reintroduce the bug or undo the plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestRangePartitionSentinel:
    """ADVICE r13 high: RDD-backed plans report the Long.MaxValue
    sizeInBytes sentinel; the derived range-partition count must fall
    back to the conf instead of overflowing Java int."""

    def test_createdataframe_input_falls_back(self, spark):
        from pwhl_data_engineering_pipeline_spark.operators.aggregates import (
            _range_partition_count,
        )

        df = spark.createDataFrame(
            [("a", float(i)) for i in range(50)], "g string, v double"
        )
        n = _range_partition_count(df)
        conf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        par = spark.sparkContext.defaultParallelism
        assert n == max(par, conf)

    def test_percentiles_work_on_createdataframe_input(self, spark):
        from pwhl_data_engineering_pipeline_spark.operators.aggregates import (
            exact_percentiles_distributed,
        )

        df = spark.createDataFrame(
            [("a", float(i)) for i in range(100)], "g string, v double"
        )
        rows = exact_percentiles_distributed(df, "g", "v", [0.5]).collect()
        assert len(rows) == 1 and rows[0]["value"] == pytest.approx(49.5)

    def test_localcheckpoint_input_falls_back(self, spark, sf_dir):
        from pwhl_data_engineering_pipeline_spark.operators.aggregates import (
            _RANGE_PARTITION_MAX,
            _range_partition_count,
        )
        from pwhl_data_engineering_pipeline_spark.sources.readers import (
            read_testdata,
        )

        df = read_testdata(spark, sf_dir, "orders").localCheckpoint(eager=False)
        assert _range_partition_count(df) <= _RANGE_PARTITION_MAX


class TestLocalFrameRowLength:
    """ADVICE r13 low: a row shorter/longer than the schema must raise
    (the classic createDataFrame contract), never silently NULL-pad or
    drop trailing values."""

    def test_short_row_raises(self, spark):
        from pwhl_data_engineering_pipeline_spark.sources.readers import local_frame

        with pytest.raises(Exception):
            local_frame(spark, [(1,), (2, "y")], "a long, b string").collect()

    def test_long_row_raises(self, spark):
        from pwhl_data_engineering_pipeline_spark.sources.readers import local_frame

        with pytest.raises(Exception):
            local_frame(spark, [(1, "x", 99)], "a long, b string").collect()

    def test_good_rows_still_localrelation(self, spark):
        from pwhl_data_engineering_pipeline_spark.sources.readers import local_frame

        df = local_frame(spark, [(1, "x"), (2, "y")], "a long, b string")
        assert [tuple(r) for r in df.orderBy("a").collect()] == [(1, "x"), (2, "y")]
        assert "LocalTableScan" in df._jdf.queryExecution().executedPlan().toString()


class TestFanOutGate:
    """VERDICT r13 #1/#2: the map-stage fan-out must be a no-op when the
    scan already has enough native splits (at 100 TB it always does), and
    still fire on the single-file local tables."""

    def test_multi_split_input_no_exchange(self, spark, tmp_path):
        import __spark_entry__ as em

        src = spark.range(0, 10000).selectExpr(
            "id as doc_id", "repeat('word ', 20) as text"
        )
        # 8 files >= defaultParallelism//2 (tests run local[8] -> floor 4)
        src.repartition(8).write.mode("overwrite").parquet(str(tmp_path / "t"))
        df = spark.read.parquet(str(tmp_path / "t"))
        out = em._fan_out(spark, df)
        assert out is df  # untouched frame: no exchange injected
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_single_split_input_fans_out(self, spark, tmp_path):
        import __spark_entry__ as em

        src = spark.range(0, 1000).selectExpr(
            "id as doc_id", "repeat('word ', 20) as text"
        )
        src.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one"))
        df = spark.read.parquet(str(tmp_path / "one"))
        out = em._fan_out(spark, df)
        assert out is not df
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan and "RoundRobinPartitioning" in plan


class TestFusedMergeWrite:
    """VERDICT r13 #4: a keyed merge/delete commit writes its rewrite AND
    change feed in ONE partitioned job (single base scan). Pin the layout
    contract: data-dir footers carry exactly the rewrite schema (no CDF
    columns), the changes dir exposes _change as a partition column, and
    the classic two-job writers are not used on the default path."""

    def test_merge_single_fused_write(self, spark, tmp_path, monkeypatch):
        from pwhl_data_engineering_pipeline_spark.sources import snapshots as S

        path = str(tmp_path / "fused")
        S.snapshot_overwrite(
            spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), path
        )
        calls = {"data": 0, "changes": 0}
        orig_wd, orig_wc = S._write_data, S._write_changes
        monkeypatch.setattr(
            S, "_write_data",
            lambda df, p: calls.__setitem__("data", calls["data"] + 1) or orig_wd(df, p),
        )
        monkeypatch.setattr(
            S, "_write_changes",
            lambda df, p: calls.__setitem__("changes", calls["changes"] + 1)
            or orig_wc(df, p),
        )
        v = S.snapshot_merge(
            spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
            path, ["k"],
        )
        # default path: one fused write, classic writers untouched
        assert calls == {"data": 0, "changes": 0}
        got = {r["k"]: r["v"] for r in S.read_snapshot(spark, path).collect()}
        assert got == {1: "a", 2: "B", 3: "c"}
        # data files carry exactly the table schema (no _change/_pleg)
        m = S.read_manifest(spark, path, v)
        import os
        ddir = os.path.join(path, "data", m["dirs"][-1])
        raw = spark.read.parquet(ddir)
        assert sorted(raw.columns) == ["k", "v"]
        # changes dir: _change rides as a discovered partition column
        feed = S.snapshot_changes_feed(spark, path, v - 1, v)
        rows = sorted((r["_change"], r["k"]) for r in feed.collect())
        assert rows == [("delete", 2), ("insert", 2), ("insert", 3)]

    def test_delete_single_fused_write(self, spark, tmp_path, monkeypatch):
        from pwhl_data_engineering_pipeline_spark.sources import snapshots as S

        path = str(tmp_path / "fusedd")
        S.snapshot_overwrite(
            spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), path
        )
        calls = {"n": 0}
        orig_wd = S._write_data
        monkeypatch.setattr(
            S, "_write_data",
            lambda df, p: calls.__setitem__("n", calls["n"] + 1) or orig_wd(df, p),
        )
        v = S.snapshot_delete(
            spark.createDataFrame([(2,)], "k long"), path, ["k"]
        )
        assert calls["n"] == 0
        got = {r["k"]: r["v"] for r in S.read_snapshot(spark, path).collect()}
        assert got == {1: "a"}
        feed = S.snapshot_changes_feed(spark, path, v - 1, v)
        assert [(r["_change"], r["k"]) for r in feed.collect()] == [("delete", 2)]

    def test_merge_nothing_matched_empty_feed_leg(self, spark, tmp_path):
        from pwhl_data_engineering_pipeline_spark.sources import snapshots as S

        path = str(tmp_path / "fusede")
        S.snapshot_overwrite(
            spark.createDataFrame([(1, "a")], "k long, v string"), path
        )
        # inserts only — the delete partition is simply absent
        v = S.snapshot_merge(
            spark.createDataFrame([(9, "z")], "k long, v string"), path, ["k"]
        )
        feed = S.snapshot_changes_feed(spark, path, v - 1, v)
        assert [(r["_change"], r["k"]) for r in feed.collect()] == [("insert", 9)]

    def test_delete_nothing_matched_explicit_empty_feed(self, spark, tmp_path):
        from pwhl_data_engineering_pipeline_spark.sources import snapshots as S

        path = str(tmp_path / "fusedn")
        S.snapshot_overwrite(
            spark.createDataFrame([(1, "a")], "k long, v string"), path
        )
        v = S.snapshot_delete(
            spark.createDataFrame([(7,)], "k long"), path, ["k"]
        )
        feed = S.snapshot_changes_feed(spark, path, v - 1, v)
        assert feed.count() == 0
        got = {r["k"]: r["v"] for r in S.read_snapshot(spark, path).collect()}
        assert got == {1: "a"}
