"""Differential test: every oracle-backed queries() entry must match its
DuckDB oracle on the same parquet — the local replica of the driver's t2
correctness gate (BASELINE.md)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .oracle_utils import compare, duckdb_conn

QUERIES = entrymod.extended_queries()
ORACLES = entrymod.extended_oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_replica_catches_hugeint_float64(spark, con):
    """The local replica must reproduce the driver's verdict on the round-1
    failure mode: DuckDB HUGEINT → pandas float64 ("25.0") vs Spark bigint
    ("25"). An uncast sum(BIGINT) oracle must FAIL against a long on the
    Spark side, and pass once CAST ... AS BIGINT is applied."""
    sdf = spark.range(1).selectExpr("CAST(25 AS BIGINT) AS s")
    ok, msg = compare(sdf, con, "SELECT sum(x) AS s FROM (SELECT CAST(25 AS BIGINT) AS x)")
    assert not ok and "values differ" in msg
    ok, _ = compare(
        sdf, con, "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT CAST(25 AS BIGINT) AS x)"
    )
    assert ok


def test_replica_rejects_list_columns(spark, con):
    """List-typed outputs crash the driver's pandas canon — the replica must
    flag them instead of silently passing fetchall-level equality."""
    sdf = spark.range(1).selectExpr("array('a','b') AS xs")
    ok, msg = compare(sdf, con, "SELECT ['a','b'] AS xs")
    assert not ok and "list-typed" in msg


def test_queries_fit_driver_window():
    """The driver correctness-checks only the FIRST 50 queries() entries
    (round-1 verdict): the driver-facing dict must sit inside that window,
    its oracles must be a subset of it, and every kit-consolidated
    standalone query must still be covered here via extended_queries()."""
    driver_q = entrymod.queries()
    assert len(driver_q) <= 50
    assert set(entrymod.oracle_sql()) <= set(driver_q)
    assert set(driver_q) <= set(QUERIES)
