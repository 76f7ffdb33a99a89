"""Sessionization (batch == streaming on closed sessions) and salted
aggregation/join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import sessions, skew


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap > 60s between 100 and 300)
        (1, 1, "2025-01-01 10:00:00"),
        (2, 1, "2025-01-01 10:00:30"),
        (3, 1, "2025-01-01 10:05:00"),
        (4, 1, "2025-01-01 10:05:10"),
        # user 2: one session
        (5, 2, "2025-01-01 11:00:00"),
        (6, 2, "2025-01-01 11:00:59"),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_sessionize_batch(events):
    out = sessions.sessionize(events, "ts", ["user_id"], 60, ["event_id"])
    got = {(r["event_id"]): r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1}


def test_session_stats(events):
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_sec"])
        for r in sessions.session_stats(events, "ts", ["user_id"], 60, ["event_id"]).collect()
    }
    assert out == {(1, 1): (2, 30), (1, 2): (2, 10), (2, 1): (2, 59)}


def test_streaming_sessions_match_batch(spark, events, tmp_path):
    landing = str(tmp_path / "landing")
    events.write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(events.schema).parquet(landing)
    rollup = sessions.streaming_sessionize(stream, "ts", ["user_id"], 60, watermark="0 seconds")
    q = (
        rollup.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"].isoformat()): r["n_events"]
        for r in spark.table("t_sessions").collect()
    }
    # watermark = max event time (11:00:59): sessions ending before it emit.
    assert got[(1, "2025-01-01T10:00:00")] == 2
    assert got[(1, "2025-01-01T10:05:00")] == 2


def test_salted_rollup_equivalence(spark):
    df = spark.createDataFrame(
        [(k, float(v)) for k in ["hot"] * 50 + ["cold"] * 3 for v in [1, 2]],
        "k string, v double",
    )
    direct = {
        r["k"]: (r["total"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("v").alias("n"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["total"], r["n"], r["mn"], r["mx"])
        for r in skew.salted_rollup(
            df,
            ["k"],
            {
                "total": (F.col("v"), "sum"),
                "n": (F.col("v"), "count"),
                "mn": (F.col("v"), "min"),
                "mx": (F.col("v"), "max"),
            },
            salt_buckets=4,
        ).collect()
    }
    assert direct == salted


def test_salted_rollup_rejects_non_algebraic(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="non-algebraic"):
        skew.salted_rollup(df, ["k"], {"bad": (F.col("v"), "avg")})


def test_salted_join_equivalence(spark):
    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(["hot"] * 40 + ["a", "b"])], "k string, fv long"
    )
    dim = spark.createDataFrame(
        [("hot", 100), ("a", 200), ("b", 300), ("unused", 400)], "k string, dv long"
    )
    direct = {(r["k"], r["fv"], r["dv"]) for r in fact.join(dim, ["k"]).collect()}
    salted = {(r["k"], r["fv"], r["dv"]) for r in skew.salted_join(fact, dim, ["k"]).collect()}
    assert direct == salted and len(direct) == 42
