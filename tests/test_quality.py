"""Contract API (SURVEY.md §2.9 V1-V7) behavior in strict/warn/off modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.quality import Contract, ContractViolation


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (2, "c", 30.0)],
        "id long, name string, val double",
    )


def test_require_columns_strict(df):
    c = Contract(mode="strict")
    assert c.require_columns(df, ["id", "name"]) is df
    with pytest.raises(ContractViolation, match="missing"):
        c.require_columns(df, ["id", "nope"])


def test_require_columns_warn_passes(df):
    Contract(mode="warn").require_columns(df, ["nope"])  # logs, no raise


def test_unique_key(df):
    c = Contract(mode="strict")
    c.require_unique_key(df, ["id", "name"])  # unique → ok
    with pytest.raises(ContractViolation, match="duplicate"):
        c.require_unique_key(df, ["id"])  # id=2 twice


def test_m1_validation(spark, df):
    dim = spark.createDataFrame([(1, "x"), (1, "y")], "id long, attr string")
    with pytest.raises(ContractViolation):
        Contract(mode="strict").require_m1(dim, ["id"])


def test_integrity_counts(df):
    c = Contract(mode="warn")
    c.check_integrity(df, F.col("val") > 0, name="val_pos")
    # val=None row fails the predicate (coalesce false)
    assert c.counters["val_pos"] == 1


def test_null_rate(df):
    c = Contract(mode="warn")
    rates = c.check_null_rate(df, ["val", "name"])
    assert rates == {"val": 1, "name": 0}


def test_off_mode_is_noop(df):
    c = Contract(mode="off")
    c.require_unique_key(df, ["id"])  # would fail in strict; no action in off
    assert c.check_null_rate(df, ["val"]) == {}
    c.reconcile_counts("x", df)
    assert "x" not in c.counters


def test_reconcile_counts(df):
    c = Contract(mode="warn")
    c.reconcile_counts("stage1", df)
    assert c.counters["stage1"] == 3


def test_quarantine_routes_and_labels(spark):
    """good/bad partition the input; bad rows name every failed rule in
    rule order; NULL rule results count as failures."""
    from pwhl_data_engineering_pipeline_spark.quality import quarantine

    df = spark.createDataFrame(
        [
            (1, 10, "a"),      # clean
            (2, -5, "b"),      # fails positive
            (3, 200, None),    # fails cap AND named (NULL comparison -> fail)
            (4, None, "d"),    # NULL value: both numeric rules fail
        ],
        "id long, qty int, name string",
    )
    good, bad = quarantine(
        df,
        {
            "positive": F.col("qty") > 0,
            "under_cap": F.col("qty") <= 100,
            "named": F.col("name").isNotNull(),
        },
    )
    assert [r["id"] for r in good.orderBy("id").collect()] == [1]
    got = {r["id"]: r["violations"] for r in bad.collect()}
    assert got == {
        2: ["positive"],
        3: ["under_cap", "named"],
        4: ["positive", "under_cap"],
    }
    # partition property: good + bad == input, no overlap
    assert good.count() + bad.count() == df.count()
    import pytest

    with pytest.raises(ValueError):
        quarantine(df, {})


def test_quarantine_rejects_existing_violations_column(spark):
    from pwhl_data_engineering_pipeline_spark.quality import quarantine

    df = spark.createDataFrame([(1, ["old"])], "id long, violations array<string>")
    import pytest

    with pytest.raises(ValueError, match="violations"):
        quarantine(df, {"pos": F.col("id") > 0})


def test_profile_one_pass_per_column_stats(spark):
    from pwhl_data_engineering_pipeline_spark.quality import profile

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5), (3, "a", None)],
        "id long, name string, score double",
    )
    got = {r["column"]: r.asDict() for r in profile(df).collect()}
    assert set(got) == {"id", "name", "score"}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_nulls"] == 0
    assert got["name"]["n_nulls"] == 1 and abs(got["name"]["null_rate"] - 0.25) < 1e-9
    assert got["score"]["n_nulls"] == 2
    assert got["id"]["min"] == "1" and got["id"]["max"] == "3"
    assert got["name"]["min"] == "a" and got["name"]["max"] == "b"
    # HLL on tiny cardinalities is exact
    assert got["id"]["approx_distinct"] == 3
    assert got["id"]["dtype"] == "bigint"
    # column subset + empty guard
    sub = profile(df, ["name"]).collect()
    assert len(sub) == 1 and sub[0]["column"] == "name"
    import pytest

    with pytest.raises(ValueError):
        profile(df, [])


def test_profile_dotted_names_and_map_columns(spark):
    """ADVICE round 3: dotted column names must profile as themselves (not
    parse as struct paths) and map columns must skip min/max + the distinct
    sketch with NULLs instead of raising AnalysisException."""
    from pwhl_data_engineering_pipeline_spark.quality import profile

    df = spark.sql(
        "SELECT 1 AS `a.b`, map('k', 2) AS m UNION ALL SELECT NULL, map('k', 3)"
    )
    prof = {r["column"]: r for r in profile(df).collect()}
    assert prof["a.b"]["n_nulls"] == 1 and prof["a.b"]["n_rows"] == 2
    assert prof["a.b"]["min"] == "1" and prof["a.b"]["max"] == "1"
    m = prof["m"]
    assert m["n_nulls"] == 0
    assert m["min"] is None and m["max"] is None and m["approx_distinct"] is None
