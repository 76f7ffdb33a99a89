"""Streaming session windows + stream-stream joins: availableNow runs must
match the identical batch computation (session_window / interval join have
the same semantics both ways — the differential is exact)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.streaming import joins as sj
from pwhl_data_engineering_pipeline_spark.streaming import sessions as ss


def _events(spark):
    rows = [
        # user 1: two sessions (gap 30 min; 40-min hole between them)
        (1, "2025-01-01 10:00:00", 1.0),
        (1, "2025-01-01 10:10:00", 2.0),
        (1, "2025-01-01 10:50:00", 4.0),
        (1, "2025-01-01 11:00:00", 8.0),
        # user 2: one session, single event
        (2, "2025-01-01 10:05:00", 16.0),
        # sentinel far ahead: pushes the watermark so earlier sessions close
        (99, "2025-01-02 12:00:00", 0.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_streaming_sessions_match_batch(spark, tmp_path):
    batch = _events(spark)
    landing = str(tmp_path / "sess_landing")
    batch.write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema(batch.schema).parquet(landing)
    q = (
        ss.streaming_session_stats(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sess_stream")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"].isoformat()): (
            r["n_events"], r["total_value"], r["duration_sec"]
        )
        for r in spark.table("t_sess_stream").collect()
    }
    # Batch twin over the same frame, restricted to sessions the stream
    # finalized (the sentinel's own session stays open in state).
    expected = {
        (r["user_id"], r["session_start"].isoformat()): (
            r["n_events"], r["total_value"], r["duration_sec"]
        )
        for r in ss.session_stats_agg(batch, gap="30 minutes").collect()
        if r["user_id"] != 99
    }
    assert got == expected
    # shape: user 1 split into two sessions; gap extends each end by 30 min
    u1 = [k for k in expected if k[0] == 1]
    assert len(u1) == 2


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    reqs = spark.createDataFrame(
        [
            (1, "2025-01-01 10:00:00", "r1"),
            (1, "2025-01-01 11:00:00", "r2"),
            (2, "2025-01-01 10:00:00", "r3"),
        ],
        "user_id long, req_ts string, req_id string",
    ).withColumn("req_ts", F.to_timestamp("req_ts"))
    resps = spark.createDataFrame(
        [
            (1, "2025-01-01 10:05:00", "a1"),   # matches r1 (within 15 min)
            (1, "2025-01-01 10:30:00", "a2"),   # matches nothing (>15 min)
            (2, "2025-01-01 10:14:00", "a3"),   # matches r3
        ],
        "user_id long, resp_ts string, resp_id string",
    ).withColumn("resp_ts", F.to_timestamp("resp_ts"))

    l_dir, r_dir = str(tmp_path / "req"), str(tmp_path / "resp")
    reqs.write.mode("overwrite").parquet(l_dir)
    resps.write.mode("overwrite").parquet(r_dir)

    ls = spark.readStream.schema(reqs.schema).parquet(l_dir)
    rs = spark.readStream.schema(resps.schema).parquet(r_dir)
    joined = sj.stream_stream_interval_join(
        ls, rs, ["user_id"], "req_ts", "resp_ts",
        lower_seconds=0, upper_seconds=900,
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssj")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r["req_id"], r["resp_id"]) for r in spark.table("t_ssj").collect()}
    expected = {
        (r["req_id"], r["resp_id"])
        for r in reqs.join(
            resps,
            (reqs.user_id == resps.user_id)
            & (resps.resp_ts >= reqs.req_ts)
            & (resps.resp_ts <= reqs.req_ts + F.expr("INTERVAL 900 SECONDS")),
        ).collect()
    }
    assert got == expected == {("r1", "a1"), ("r3", "a3")}


def test_stream_stream_join_requires_distinct_ts_names(spark):
    df = spark.range(1).selectExpr("id AS user_id", "current_timestamp() AS ts", "1.0 AS v")
    try:
        sj.stream_stream_interval_join(df, df, ["user_id"], "ts", "ts")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
