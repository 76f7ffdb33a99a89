"""SCD2 operators: gaps-and-islands history collapse + change-batch apply."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import scd2


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_collapse_history_runs(spark):
    obs = spark.createDataFrame(
        [
            (1, "bronze", "2025-01-01 00:00:00"),
            (1, "bronze", "2025-01-02 00:00:00"),
            (1, "gold", "2025-01-03 00:00:00"),
            (1, "gold", "2025-01-04 00:00:00"),
            (1, "bronze", "2025-01-05 00:00:00"),   # back to bronze → NEW run
            (2, "silver", "2025-01-01 00:00:00"),
        ],
        "user_id long, tier string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["user_id"], r["valid_from"].isoformat()): (
            r["tier"], r["valid_to"].isoformat() if r["valid_to"] else None,
            r["n_observations"], r["is_current"],
        )
        for r in scd2.collapse_history(obs, ["user_id"], "tier", "ts").collect()
    }
    assert out == {
        (1, "2025-01-01T00:00:00"): ("bronze", "2025-01-03T00:00:00", 2, False),
        (1, "2025-01-03T00:00:00"): ("gold", "2025-01-05T00:00:00", 2, False),
        (1, "2025-01-05T00:00:00"): ("bronze", None, 1, True),
        (2, "2025-01-01T00:00:00"): ("silver", None, 1, True),
    }


def test_collapse_history_null_attr_runs(spark):
    # NULL attribute values form runs too (null-safe change detection)
    obs = spark.createDataFrame(
        [(1, None, "2025-01-01 00:00:00"), (1, None, "2025-01-02 00:00:00"),
         (1, "a", "2025-01-03 00:00:00")],
        "user_id long, tier string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    runs = scd2.collapse_history(obs, ["user_id"], "tier", "ts").collect()
    assert len(runs) == 2
    null_run = [r for r in runs if r["tier"] is None][0]
    assert null_run["n_observations"] == 2 and not null_run["is_current"]


def test_scd2_apply(spark):
    dim = spark.createDataFrame(
        [
            # user 1: one closed version + one current
            (1, "bronze", _ts("2025-01-01"), _ts("2025-02-01"), False),
            (1, "gold", _ts("2025-02-01"), None, True),
            # user 2: current only, attrs unchanged in the batch
            (2, "silver", _ts("2025-01-15"), None, True),
            # user 3: current, not in the batch
            (3, "bronze", _ts("2025-01-20"), None, True),
        ],
        "user_id long, tier string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "platinum"), (2, "silver"), (4, "bronze")],
        "user_id long, tier string",
    )
    eff = F.lit("2025-03-01 00:00:00").cast("timestamp")
    out = scd2.scd2_apply(dim, updates, ["user_id"], ["tier"], eff)
    rows = sorted(
        (r["user_id"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    )
    assert rows == sorted([
        (1, "bronze", _ts("2025-01-01"), _ts("2025-02-01"), False),
        (1, "gold", _ts("2025-02-01"), _ts("2025-03-01"), False),   # closed
        (1, "platinum", _ts("2025-03-01"), None, True),             # new version
        (2, "silver", _ts("2025-01-15"), None, True),               # unchanged
        (3, "bronze", _ts("2025-01-20"), None, True),               # untouched
        (4, "bronze", _ts("2025-03-01"), None, True),               # brand new
    ])
    # exactly one current row per key
    cur = out.filter("is_current").groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_apply_null_is_current_preserved(spark):
    """A NULL is_current row must pass through as historical, not vanish
    (it matches neither filter(x) nor filter(~x) under null-unsafe
    booleans); empty attr_cols must raise, not TypeError later."""
    import pytest

    dim = spark.createDataFrame(
        [
            (1, "bronze", _ts("2025-01-01"), None, None),  # NULL flag: backfill row
            (2, "silver", _ts("2025-01-15"), None, True),
        ],
        "user_id long, tier string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame([(2, "gold")], "user_id long, tier string")
    eff = F.lit("2025-03-01 00:00:00").cast("timestamp")
    out = scd2.scd2_apply(dim, updates, ["user_id"], ["tier"], eff)
    rows = sorted((r["user_id"], r["tier"], r["is_current"]) for r in out.collect())
    assert rows == sorted([
        (1, "bronze", None),      # preserved untouched
        (2, "silver", False),     # closed
        (2, "gold", True),        # new version
    ])
    with pytest.raises(ValueError, match="attr_cols"):
        scd2.scd2_apply(dim, updates, ["user_id"], [], eff)


def _collapse_reference(rows):
    """Driver-side reference: per key, sort by ts, split into runs of equal
    attr (None == None), emit (key, attr, first_ts, next_run_first_ts|None,
    n, is_current)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, a, ts in rows:
        by_key[k].append((ts, a))
    out = set()
    for k, obs in by_key.items():
        obs.sort(key=lambda x: x[0])
        runs = []
        for ts, a in obs:
            if runs and runs[-1][0] == a:
                runs[-1][2] += 1
            else:
                runs.append([a, ts, 1])
        for i, (a, start, n) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            out.add((k, a, start, nxt, n, nxt is None))
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # key
            st.sampled_from([None, "a", "b", "c"]),       # attr
            st.integers(min_value=0, max_value=20),       # distinct ts slot
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[0], r[2]),  # one observation per (key, ts)
    )
)
def test_collapse_history_matches_reference(spark, obs):
    rows = [
        (k, a, datetime.datetime(2025, 1, 1) + datetime.timedelta(hours=t))
        for k, a, t in obs
    ]
    df = spark.createDataFrame(rows, "user_id long, tier string, ts timestamp")
    got = {
        (r["user_id"], r["tier"], r["valid_from"], r["valid_to"],
         r["n_observations"], r["is_current"])
        for r in scd2.collapse_history(df, ["user_id"], "tier", "ts").collect()
    }
    assert got == _collapse_reference(rows)


def test_collapse_single_shuffle(spark):
    """All three windows + the groupBy share the key partitioning — the
    collapse must cost ONE exchange of the observation stream."""
    obs = spark.createDataFrame(
        [(1, "a", _ts("2025-01-01"))], "user_id long, tier string, ts timestamp"
    )
    plan = (
        scd2.collapse_history(obs, ["user_id"], "tier", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
