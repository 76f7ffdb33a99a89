"""Range-join operators vs brute-force ground truth (cross join + filter on
small inputs), including bucket-boundary and multi-bucket-span edge cases."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import rangejoin


def _intervals(spark, n, seed, key_vals=("a", "b")):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.uniform(0, 1000)
        rows.append((i, rng.choice(key_vals), s, s + rng.uniform(0, 50)))
    return spark.createDataFrame(rows, "iid long, k string, s double, e double")


def test_interval_overlap_matches_bruteforce(spark):
    left = _intervals(spark, 120, seed=1).withColumnsRenamed({"iid": "lid", "s": "ls", "e": "le"})
    right = _intervals(spark, 150, seed=2).withColumnsRenamed({"iid": "rid", "s": "rs", "e": "re"})
    got = {
        (r["lid"], r["rid"])
        for r in rangejoin.interval_overlap_join(
            left, right, ["k"], "ls", "le", "rs", "re", bucket_width=20.0
        ).collect()
    }
    brute = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right.withColumnRenamed("k", "k2"))
        .filter((F.col("k") == F.col("k2")) & (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .collect()
    }
    assert got == brute and len(brute) > 50
    # exactly-once: no duplicate pairs even for intervals spanning many buckets
    rows = rangejoin.interval_overlap_join(
        left, right, ["k"], "ls", "le", "rs", "re", bucket_width=1.0
    ).groupBy("lid", "rid").count().filter("count > 1").count()
    assert rows == 0


def test_point_in_interval_inner_and_left(spark):
    intervals = _intervals(spark, 60, seed=3)
    points = spark.createDataFrame(
        [(i, random.Random(100 + i).choice(["a", "b"]), float(i * 11 % 1100)) for i in range(200)],
        "pid long, k string, p double",
    )
    got = {
        (r["pid"], r["iid"])
        for r in rangejoin.point_in_interval_join(
            points, intervals, ["k"], "p", "s", "e"
        ).collect()
    }
    brute = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals.withColumnRenamed("k", "k2"))
        .filter((F.col("k") == F.col("k2")) & (F.col("s") <= F.col("p")) & (F.col("p") <= F.col("e")))
        .collect()
    }
    assert got == brute

    out = rangejoin.point_in_interval_join(points, intervals, ["k"], "p", "s", "e", how="left")
    # every point appears at least once; matched pairs equal brute force
    assert out.select("pid").distinct().count() == 200
    got_left = {(r["pid"], r["iid"]) for r in out.filter(F.col("iid").isNotNull()).collect()}
    assert got_left == brute


def test_point_in_interval_left_null_payload(spark):
    """Left-join bookkeeping must be null-safe: a matched point with a NULL
    payload column must appear exactly once (matched), never duplicated as a
    spurious unmatched row."""
    intervals = spark.createDataFrame(
        [(1, "a", 0.0, 10.0), (2, "a", 5.0, 15.0), (3, "b", 0.0, 10.0)],
        "iid long, k string, s double, e double",
    )
    points = spark.createDataFrame(
        [(10, "a", 7.0, None), (11, "a", 99.0, None), (12, "b", 3.0, "x")],
        "pid long, k string, p double, payload string",
    )
    out = rangejoin.point_in_interval_join(
        points, intervals, ["k"], "p", "s", "e", how="left", bucket_width=5.0
    ).collect()
    by_pid: dict = {}
    for r in out:
        by_pid.setdefault(r["pid"], []).append(r["iid"])
    # pid 10 (NULL payload) matches intervals 1 and 2 — and ONLY those rows
    assert sorted(by_pid[10]) == [1, 2]
    # pid 11 is unmatched → exactly one NULL-interval row despite NULL payload
    assert by_pid[11] == [None]
    assert by_pid[12] == [3]
    assert len(out) == 4


def test_auto_width_does_not_scan_full_table(spark):
    """_auto_width must estimate from a bounded sample: a poison row placed
    beyond the sample window would blow up a full-table scan."""
    from pyspark.sql.types import DoubleType

    def poison(v):
        if v is not None and v > 900_000:
            raise RuntimeError("full scan reached the poison rows")
        return float(v) + 5.0

    poison_udf = F.udf(poison, DoubleType())
    df = (
        spark.range(1_000_000, numPartitions=8)
        .withColumn("s", F.col("id").cast("double"))
        .withColumn("e", poison_udf("id"))
    )
    w = rangejoin._auto_width(df, "s", "e")
    assert w == 5.0


def test_auto_bucket_width(spark):
    left = _intervals(spark, 40, seed=5).withColumnsRenamed({"iid": "lid", "s": "ls", "e": "le"})
    right = _intervals(spark, 40, seed=6).withColumnsRenamed({"iid": "rid", "s": "rs", "e": "re"})
    auto = rangejoin.interval_overlap_join(left, right, ["k"], "ls", "le", "rs", "re")
    fixed = rangejoin.interval_overlap_join(left, right, ["k"], "ls", "le", "rs", "re", bucket_width=25.0)
    a = {(r["lid"], r["rid"]) for r in auto.collect()}
    b = {(r["lid"], r["rid"]) for r in fixed.collect()}
    assert a == b


def test_rangejoin_plan_is_equijoin(spark):
    """The bucketized rewrite must produce an equi-join (hash/sort-merge),
    never the nested-loop/cartesian plan the raw inequality condition
    yields — that is its entire reason to exist."""
    left = _intervals(spark, 10, seed=7).withColumnsRenamed({"iid": "lid", "s": "ls", "e": "le"})
    right = _intervals(spark, 10, seed=8).withColumnsRenamed({"iid": "rid", "s": "rs", "e": "re"})
    df = rangejoin.interval_overlap_join(left, right, ["k"], "ls", "le", "rs", "re", bucket_width=10.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan
