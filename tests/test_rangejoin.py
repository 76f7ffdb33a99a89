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
