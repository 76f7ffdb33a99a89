"""Property-based tests (hypothesis) for the scalar kit — batched: each
property generates many examples driver-side and runs ONE Spark job."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.functions import scalars

DATES = st.dates(min_value=datetime.date(1950, 1, 2), max_value=datetime.date(2100, 12, 30))


@settings(max_examples=5, deadline=None)
@given(st.lists(DATES, min_size=1, max_size=50))
def test_to_date_multi_roundtrips_both_formats(spark, dates):
    rows = []
    expected = []
    for i, d in enumerate(dates):
        s = f"{d.month}/{d.day}/{d.year}" if i % 2 == 0 else d.isoformat()
        rows.append((s,))
        expected.append(d)
    df = spark.createDataFrame(rows, "s string")
    got = [r["p"] for r in df.select(scalars.to_date_multi("s").alias("p")).collect()]
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50))
def test_slugify_properties(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    slugs = [r["v"] for r in df.select(scalars.slugify("s").alias("v")).collect()]
    for slug in slugs:
        # output alphabet is [a-z0-9_], never edge-underscored, idempotent-safe
        assert all(c.islower() or c.isdigit() or c == "_" for c in slug)
        assert not slug.startswith("_") and not slug.endswith("_")


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    )
)
def test_portable_round_matches_duckdb(spark, values):
    import duckdb

    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = [r["r"] for r in df.select(scalars.portable_round("v", 2).alias("r")).collect()]
    con = duckdb.connect()
    exp = [
        con.execute("SELECT floor(CAST(? AS DOUBLE) * 100.0 + 0.5) / 100.0", [v]).fetchone()[0]
        for v in values
    ]
    assert got == exp


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=1e6, allow_nan=False),
            st.floats(min_value=0, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_safe_divide_never_raises_and_nulls_on_zero(spark, pairs):
    df = spark.createDataFrame(pairs, "a double, b double")
    out = df.select("a", "b", scalars.safe_divide("a", "b").alias("q")).collect()
    for r in out:
        if r["b"] == 0.0:
            assert r["q"] is None
        else:
            assert r["q"] is not None


@settings(max_examples=3, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=40),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.one_of(st.none(), st.integers(-50, 50))),
        min_size=1,
        max_size=40,
    ),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """For random keyed event streams, asof_join equals the definitional
    semantics: the payload of the LAST right row with ts <= left ts (ties on
    ts resolved by uniqueness precondition), including NULL payloads carried
    from the matched row itself."""
    from pwhl_data_engineering_pipeline_spark.operators import asof

    # enforce the operator's precondition: right unique per (key, ts)
    seen = {}
    for k, ts, v in rights:
        seen[(k, ts)] = v
    rrows = [(k, ts, v) for (k, ts), v in sorted(seen.items())]
    lrows = [(i, k, ts) for i, (k, ts) in enumerate(lefts)]
    left = spark.createDataFrame(lrows, "lid long, k long, ts long")
    right = spark.createDataFrame(rrows, "k long, ts long, payload long")
    out = {
        r["lid"]: r["payload"]
        for r in asof.asof_join(
            left, right, keys=["k"], left_ts="ts", right_ts="ts", right_payload=["payload"]
        ).collect()
    }
    for lid, k, ts in lrows:
        cands = [(rts, v) for (rk, rts, v) in rrows if rk == k and rts <= ts]
        expect = max(cands)[1] if cands else None
        assert out[lid] == expect, (lid, k, ts, cands)
