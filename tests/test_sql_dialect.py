"""Run the reference's OWN BigQuery SQL files (read from /root/reference,
never copied) through the dialect translator against an engine-built fact —
the strongest parity check: a reference user's queries run unchanged."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.functions import sql_dialect

REF_SQL = "/root/reference/sql"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SQL), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def star(spark):
    """Build the engine fact from synthetic reference-shaped inputs and
    register it under the reference's source-table name."""
    from pwhl_data_engineering_pipeline_spark import schemas
    from pwhl_data_engineering_pipeline_spark.plans.pipeline import run_reference_pipeline
    from pwhl_data_engineering_pipeline_spark.quality import Contract

    markets = spark.createDataFrame(
        [("BOS_01", "Boston", "Arena A", "US", 1.0, 2.0, "UTC"),
         ("MTL_01", "Montreal", "Arena B", "CA", 3.0, 4.0, "UTC")],
        schemas.MARKETS,
    )
    hourly = spark.createDataFrame(
        [
            (f"2025-01-0{d}T{h:02d}:00", 2.0 + h * 0.1, 70.0, 5.0, 0.1 * (h % 2), m, v)
            for d in (1, 2, 3)
            for h in range(24)
            for m, v in [("Boston", "Arena A"), ("Montreal", "Arena B")]
        ],
        schemas.WEATHER_HOURLY_RAW,
    )
    sales = spark.createDataFrame(
        [
            (f"1/{d}/2025", sec, "1", "1", "60", "Online", f"A{d}{i}", "2", "120")
            for d in (1, 2, 3)
            for sec in ("Lower Bowl", "Club")
            for i in range(2)
        ],
        schemas.TICKET_SALES_RAW,
    )
    capacity = spark.createDataFrame(
        [(f"1/{d}/2025", sec, "50") for d in (1, 2, 3) for sec in ("Lower Bowl", "Club")],
        schemas.SECTION_CAPACITY_RAW,
    )
    fact = run_reference_pipeline(spark, hourly, sales, capacity, markets, Contract(mode="off"))
    fact.createOrReplaceTempView("fact_ticket_sales_with_weather")
    return fact


def _read(name: str) -> str:
    with open(f"{REF_SQL}/{name}", encoding="utf-8-sig") as f:
        return f.read()


def test_02_dims_and_facts_run(spark, star):
    sql_dialect.run_bigquery_script(spark, _read("02_create_dims_and_facts.sql"))
    assert spark.table("dim_venue").count() == 2
    assert spark.table("dim_market").count() == 2
    assert spark.table("dim_section").count() == 4  # 2 venues × 2 sections
    assert spark.table("dim_date").count() == 59    # Jan 1 – Feb 28 2025
    # fact grain: 3 dates × 2 venues × 2 sections
    assert spark.table("fact_ticket_sales").count() == 12
    r = spark.table("fact_ticket_sales").filter(
        (F.col("venue_id") == "BOS_01") & (F.col("section") == "Club")
    ).collect()[0]
    # 2 txns × 2 tickets × $60 per (date, section): utilization = 4/50
    assert r["tickets_sold"] == 4 and r["revenue"] == 240.0
    assert r["utilization"] == pytest.approx(4 / 50)
    assert r["avg_price"] == pytest.approx(60.0)


def test_03_views_run(spark, star):
    sql_dialect.run_bigquery_script(spark, _read("02_create_dims_and_facts.sql"))
    sql_dialect.run_bigquery_script(spark, _read("03_create_views.sql"))
    vw = spark.table("vw_sales_weather")
    assert vw.count() > 0
    daily = spark.table("vw_market_daily")
    assert daily.filter(F.col("market") == "Boston").count() == 3


def test_10_eda_queries_run(spark, star):
    sql_dialect.run_bigquery_script(spark, _read("02_create_dims_and_facts.sql"))
    sql_dialect.run_bigquery_script(spark, _read("03_create_views.sql"))
    results = sql_dialect.run_bigquery_script(spark, _read("10_eda_queries.sql"))
    # 11 statements: 8 SELECT EDA queries + 3 viz CTAS (run as temp views)
    select_results = [df for df in results if df.columns and df.columns != ["result"]]
    for df in select_results:
        df.collect()  # every query must execute
    # the ghost-column repair makes viz 9-11 actually work (impossible on
    # the reference's own tables — SURVEY.md §7.4 item 4)
    assert spark.table("viz_market_summary").count() == 2
    assert spark.table("viz_revenue_by_section_market").count() == 4
    summary = {r["market"]: r for r in spark.table("viz_market_summary").collect()}
    assert summary["Boston"]["event_days"] == 3
    # 3 dates × 2 sections × 4 tickets = 24 true tickets, ×2 join fan-out:
    # the reference's dim_weather has no DISTINCT (sql/02:72-89), so each
    # fact row matches one dim_weather row PER SECTION — the translator
    # preserves the reference's own (inflated) semantics; the engine's
    # native star layer (plans/star.py) deduplicates dim_weather instead.
    assert summary["Boston"]["total_tickets"] == 48


def test_01_create_dataset_ttl_end_to_end(spark, tmp_path):
    """The reference's own 01_create_dataset.sql runs verbatim: the schema's
    default_table_expiration_days lands as a database property, and
    vacuum_expired enforces it (BigQuery expires tables server-side; here
    retention is an explicit catalog-only janitor pass)."""
    import shutil

    from pwhl_data_engineering_pipeline_spark.sources import writers

    db = "pwhl_takehome"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(f"spark-warehouse/{db}.db", ignore_errors=True)
    sql_dialect.run_bigquery_script(spark, _read("01_create_dataset.sql"))
    assert writers._db_property(spark, db, "default_table_expiration_days") == "365"
    assert writers._db_property(spark, db, "bq.location") == "US"

    spark.sql(f"CREATE TABLE {db}.t_old USING parquet AS SELECT 1 AS x")
    spark.sql(f"CREATE TABLE {db}.t_new USING parquet AS SELECT 2 AS x")
    spark.sql(f"CREATE TABLE {db}.t_override USING parquet AS SELECT 3 AS x")
    now = 1_800_000_000
    writers.stamp_created(spark, f"{db}.t_old", now - 366 * 86400)
    writers.stamp_created(spark, f"{db}.t_new", now - 364 * 86400)
    # per-table override beats the database default
    writers.stamp_created(spark, f"{db}.t_override", now - 10 * 86400, expiration_days=5)

    out = writers.vacuum_expired(spark, db, as_of_epoch=now)
    assert sorted(out["dropped"]) == ["t_old", "t_override"]
    assert out["kept"] == ["t_new"]
    assert [
        t["tableName"]
        for t in spark.sql(f"SHOW TABLES IN {db}").collect()
        if not t["isTemporary"]
    ] == ["t_new"]

    # a table with no stamp and no parseable created time is never dropped —
    # freshly created tables DO have catalog Created Time, so they survive a
    # vacuum dated far in the future only if TTL math says so; verify the
    # fallback path reads the catalog timestamp at all
    spark.sql(f"CREATE TABLE {db}.t_unstamped USING parquet AS SELECT 4 AS x")
    created = writers._table_created_epoch(spark, db, "t_unstamped")
    assert created is not None and abs(created - __import__("time").time()) < 3600
    spark.sql(f"DROP DATABASE {db} CASCADE")
    shutil.rmtree(f"spark-warehouse/{db}.db", ignore_errors=True)


# ---------------------------------------------------------------------------
# Round 4: widened dialect surface (verdict task 7) — SAFE_CAST, DATE_ADD/
# DATE_SUB/DATE_DIFF, EXTRACT parts, hardened parsing, loud failures.
# ---------------------------------------------------------------------------

from pwhl_data_engineering_pipeline_spark.functions.sql_dialect import (
    UnsupportedSQLError,
    split_statements,
    translate_statement,
)


def _one(spark, bq_sql):
    return spark.sql(translate_statement(bq_sql)).collect()[0][0]


def test_safe_cast_translates_to_try_cast(spark):
    assert _one(spark, "SELECT SAFE_CAST('3' AS INT) AS v") == 3
    assert _one(spark, "SELECT SAFE_CAST('nope' AS INT) AS v") is None


def test_date_add_sub_interval_units(spark):
    assert str(_one(spark, "SELECT DATE_ADD(DATE '2024-01-31', INTERVAL 1 DAY) AS v")) == "2024-02-01"
    assert str(_one(spark, "SELECT DATE_ADD(DATE '2024-01-01', INTERVAL 2 WEEK) AS v")) == "2024-01-15"
    assert str(_one(spark, "SELECT DATE_ADD(DATE '2024-01-31', INTERVAL 1 MONTH) AS v")) == "2024-02-29"
    assert str(_one(spark, "SELECT DATE_SUB(DATE '2024-03-01', INTERVAL 1 YEAR) AS v")) == "2023-03-01"
    # Spark's own 2-arg form passes through untouched
    assert str(_one(spark, "SELECT DATE_ADD(DATE '2024-01-01', 3) AS v")) == "2024-01-04"


def test_date_diff_boundary_count_semantics(spark):
    # BigQuery DATE_DIFF counts calendar-boundary crossings, not elapsed time
    assert _one(spark, "SELECT DATE_DIFF(DATE '2024-03-01', DATE '2024-02-28', MONTH) AS v") == 1
    assert _one(spark, "SELECT DATE_DIFF(DATE '2024-03-31', DATE '2024-03-01', MONTH) AS v") == 0
    assert _one(spark, "SELECT DATE_DIFF(DATE '2025-01-01', DATE '2024-12-31', YEAR) AS v") == 1
    assert _one(spark, "SELECT DATE_DIFF(DATE '2024-02-01', DATE '2024-01-22', DAY) AS v") == 10


def test_extract_parts_and_nested_parens(spark):
    assert _one(spark, "SELECT EXTRACT(DAYOFYEAR FROM DATE '2024-02-01') AS v") == 32
    assert _one(spark, "SELECT EXTRACT(ISOYEAR FROM DATE '2021-01-01') AS v") == 2020
    assert _one(spark, "SELECT EXTRACT(DAYOFWEEK FROM DATE '2024-01-07') AS v") == 1  # Sunday=1
    # nested parens inside the translated call (the round-3 sharp edge)
    assert (
        _one(spark, "SELECT FORMAT_DATE('%A', DATE_ADD(DATE '2024-01-01', INTERVAL 1 DAY)) AS v")
        == "Tuesday"
    )
    assert _one(spark, "SELECT FORMAT_DATE('%Y-%m-%d', DATE '2024-03-05') AS v") == "2024-03-05"


def test_star_except_passes_through(spark):
    """BigQuery ``SELECT * EXCEPT (...)`` is syntactically identical in
    Spark — the round-4 translator passes it through instead of raising."""
    spark.range(4).selectExpr("id", "id * 2 AS b").createOrReplaceTempView("se_t")
    out = spark.sql(sql_dialect.translate_statement("SELECT * EXCEPT (b) FROM se_t"))
    assert out.columns == ["id"] and out.count() == 4


def test_qualify_rewrites_to_window_subquery(spark):
    """Top-level QUALIFY → SELECT * EXCEPT (__q) over a subquery computing
    the predicate; covers direct window predicates, select-alias references
    (lateral column alias), GROUP BY + HAVING interplay, and ORDER BY/LIMIT
    tails surviving outside the wrap."""
    spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 5), (5, "b", 50)],
        "id INT, g STRING, v INT",
    ).createOrReplaceTempView("q_t")
    # window predicate inline
    rows = spark.sql(
        sql_dialect.translate_statement(
            "SELECT id, g FROM q_t "
            "QUALIFY row_number() OVER (PARTITION BY g ORDER BY v DESC) = 1"
        )
    ).collect()
    assert sorted((r.id, r.g) for r in rows) == [(3, "a"), (5, "b")]
    # predicate referencing a select alias, plus ORDER BY + LIMIT tail
    rows = spark.sql(
        sql_dialect.translate_statement(
            "SELECT id, rank() OVER (ORDER BY v DESC) AS rnk FROM q_t "
            "QUALIFY rnk <= 3 ORDER BY rnk LIMIT 2"
        )
    ).collect()
    assert [r.id for r in rows] == [5, 3]
    assert "rnk" in {f for r in rows for f in r.asDict()}
    # GROUP BY + HAVING stay inside the wrap; window runs over groups
    rows = spark.sql(
        sql_dialect.translate_statement(
            "SELECT g, SUM(v) AS tot FROM q_t GROUP BY g HAVING SUM(v) > 0 "
            "QUALIFY row_number() OVER (ORDER BY tot DESC) = 1"
        )
    ).collect()
    assert [(r.g, r.tot) for r in rows] == [("a", 60)]
    # WITH-CTE prefix stays outside the wrap, CTE visible in the subquery
    rows = spark.sql(
        sql_dialect.translate_statement(
            "WITH c AS (SELECT id, g, v FROM q_t) "
            "SELECT id FROM c QUALIFY row_number() OVER (ORDER BY v) = 1"
        )
    ).collect()
    assert [r.id for r in rows] == [4]
    # translated BigQuery functions still compose inside the predicate
    rows = spark.sql(
        sql_dialect.translate_statement(
            "SELECT g, COUNTIF(v > 10) AS big FROM q_t GROUP BY g "
            "QUALIFY SAFE_DIVIDE(big, 1) >= 1"
        )
    ).collect()
    assert sorted((r.g, r.big) for r in rows) == [("a", 2), ("b", 1)]


def test_split_statements_quote_and_comment_aware():
    stmts = split_statements(
        "SELECT 'a;b' AS x; -- trailing; comment\nSELECT 2"
    )
    assert len(stmts) == 2
    assert "'a;b'" in stmts[0]
    assert stmts[1] == "SELECT 2"


@pytest.mark.parametrize(
    "bad, label",
    [
        ("SELECT * REPLACE(a + 1 AS a) FROM t", "REPLACE"),
        # only TOP-LEVEL QUALIFY is rewritten; one buried in a CTE must
        # still fail loud (Spark's parser has no QUALIFY)
        (
            "WITH c AS (SELECT x FROM t QUALIFY row_number() OVER (ORDER BY x) = 1) "
            "SELECT * FROM c",
            "QUALIFY",
        ),
        ("SELECT x FROM t QUALIFY 1=1 UNION ALL SELECT x FROM u", "QUALIFY"),
        ("SELECT DISTINCT x FROM t QUALIFY row_number() OVER (ORDER BY x) = 1", "QUALIFY"),
        ("SELECT v FROM t, UNNEST(arr) AS v", "UNNEST"),
        ("SELECT PARSE_DATE('%Y', s) FROM t", "PARSE_"),
        ("SELECT FORMAT_DATE('%Q', d) FROM t", "FORMAT_DATE"),
        ("SELECT DATE_DIFF(a, b, WEEK) FROM t", "DATE_DIFF"),
        ("SELECT EXTRACT(WEEK FROM d) FROM t", "EXTRACT"),
        ("SELECT TIMESTAMP_DIFF(a, b, HOUR) FROM t", "TIMESTAMP"),
        ("SELECT STRUCT<a INT>(1) FROM t", "STRUCT"),
        ("SELECT SAFE.LOG(x) FROM t", "SAFE."),
    ],
)
def test_unsupported_constructs_fail_loud(bad, label):
    with pytest.raises(UnsupportedSQLError):
        translate_statement(bad)
    # but the marker inside a string literal is NOT a construct
    translate_statement("SELECT 'use UNNEST(x) here' AS doc")


@settings(max_examples=30, deadline=None)
@given(
    y1=st.integers(2000, 2030), m1=st.integers(1, 12), d1=st.integers(1, 28),
    y2=st.integers(2000, 2030), m2=st.integers(1, 12), d2=st.integers(1, 28),
)
def test_date_diff_month_property(spark, y1, m1, d1, y2, m2, d2):
    """Property: translated DATE_DIFF(·,·,MONTH) equals BigQuery's
    calendar-month-number difference for arbitrary date pairs."""
    a = f"{y1:04d}-{m1:02d}-{d1:02d}"
    b = f"{y2:04d}-{m2:02d}-{d2:02d}"
    got = _one(spark, f"SELECT DATE_DIFF(DATE '{a}', DATE '{b}', MONTH) AS v")
    assert got == (y1 * 12 + m1) - (y2 * 12 + m2)


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.integers(-20, 20)), min_size=1, max_size=24
    ),
    fn=st.sampled_from(["row_number()", "rank()", "dense_rank()"]),
    k=st.integers(1, 4),
    direction=st.sampled_from(["ASC", "DESC"]),
    use_alias=st.booleans(),
)
def test_qualify_property_vs_duckdb_native(spark, rows, fn, k, direction, use_alias):
    """Property: the QUALIFY rewrite run on Spark produces exactly what
    DuckDB's NATIVE QUALIFY produces on the same table and the same
    (untranslated) BigQuery-shaped SQL — random data, ranking function,
    cutoff, sort direction, and alias-vs-inline predicate form. (DuckDB
    supports QUALIFY with BigQuery semantics, making it a true
    differential oracle for the rewrite itself.)"""
    import duckdb

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    win = f"{fn} OVER (PARTITION BY g ORDER BY v {direction}, id)"
    if use_alias:
        sql = f"SELECT id, g, {win} AS rnk FROM qt QUALIFY rnk <= {k}"
    else:
        sql = f"SELECT id, g FROM qt QUALIFY {win} <= {k}"

    spark.createDataFrame(data, "id INT, g INT, v INT").createOrReplaceTempView("qt")
    got = spark.sql(sql_dialect.translate_statement(sql)).collect()
    got_set = sorted(tuple(r) for r in got)

    con = duckdb.connect()
    con.execute("CREATE TABLE qt(id INT, g INT, v INT)")
    con.executemany("INSERT INTO qt VALUES (?, ?, ?)", data)
    exp = con.sql(sql).fetchall()
    con.close()
    assert got_set == sorted(tuple(r) for r in exp)


def test_qualify_bare_alias_and_backslash_expressions(spark):
    """Review findings: (a) BigQuery's bare-alias form (SELECT SUM(v) tot)
    must inline into window predicates exactly like AS-aliases; (b) an
    aliased expression containing regex-special text (backslashes,
    $-groups) must inline literally, not crash re.sub or mangle bytes."""
    spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "id INT, g STRING, v INT"
    ).createOrReplaceTempView("qb_t")
    rows = spark.sql(
        sql_dialect.translate_statement(
            "SELECT g, SUM(v) tot FROM qb_t GROUP BY g "
            "QUALIFY row_number() OVER (ORDER BY tot DESC) = 1"
        )
    ).collect()
    assert [(r.g, r.tot) for r in rows] == [("a", 30)]
    # operand after an operator is NOT a bare alias
    rows = spark.sql(
        sql_dialect.translate_statement(
            "SELECT id, v + id AS s FROM qb_t QUALIFY rank() OVER (ORDER BY s DESC) <= 1"
        )
    ).collect()
    assert [r.id for r in rows] == [2]
    # backslash-bearing alias expression inlines literally
    spark.createDataFrame([(1, "x12y"), (2, "nope")], "id INT, t STRING").createOrReplaceTempView("qb_r")
    rows = spark.sql(
        sql_dialect.translate_statement(
            r"SELECT id, regexp_extract(t, '\\d+', 0) AS num FROM qb_r "
            "QUALIFY row_number() OVER (ORDER BY num DESC) = 1"
        )
    ).collect()
    assert [r.id for r in rows] == [1]


def test_rewrites_never_touch_string_literals(spark):
    """VERDICT r5 #1: rewriters must be literal-aware. A statement whose
    STRING LITERALS mention rewritable constructs round-trips with those
    literals byte-identical, while the same constructs OUTSIDE literals
    still translate. Before the fix, ``_find_calls`` and the keyword
    ``re.sub``s rewrote quoted text, silently altering output values."""
    stmt = (
        "SELECT "
        "'COUNTIF(x)' AS lit_countif, "
        "'SAFE_DIVIDE is safe' AS lit_sdiv, "
        "'use SAFE_CAST here' AS lit_scast, "
        "'see DATE_ADD(d, INTERVAL 1 DAY) for details' AS lit_dadd, "
        "'EXTRACT(YEAR FROM d) notes' AS lit_extract, "
        "'UNNEST(GENERATE_DATE_ARRAY(\\'2020-01-01\\', \\'2020-01-05\\', "
        "INTERVAL 1 DAY)) AS day' AS lit_unnest, "
        "COUNTIF(flag) AS n_true, "
        "SAFE_DIVIDE(10, 0) AS sdiv, "
        "SAFE_CAST('nope' AS INT) AS scast, "
        "DATE_ADD(DATE '2025-01-01', INTERVAL 1 DAY) AS nxt "
        "FROM (SELECT true AS flag)"
    )
    out = sql_dialect.translate_statement(stmt)
    # literal spans byte-identical in the translated text
    assert "'COUNTIF(x)'" in out
    assert "'SAFE_DIVIDE is safe'" in out
    assert "'use SAFE_CAST here'" in out
    assert "'see DATE_ADD(d, INTERVAL 1 DAY) for details'" in out
    assert "'EXTRACT(YEAR FROM d) notes'" in out
    assert "GENERATE_DATE_ARRAY(\\'2020-01-01\\'" in out
    # the real calls still rewrote
    assert "count_if(flag)" in out
    assert "try_divide(10, 0)" in out
    assert "try_cast('nope' AS INT)" in out
    assert "date_add" in out
    # and the statement executes with literal VALUES unaltered
    row = spark.sql(out).collect()[0]
    assert row["lit_countif"] == "COUNTIF(x)"
    assert row["lit_sdiv"] == "SAFE_DIVIDE is safe"
    assert row["lit_scast"] == "use SAFE_CAST here"
    assert row["lit_dadd"] == "see DATE_ADD(d, INTERVAL 1 DAY) for details"
    assert row["lit_extract"] == "EXTRACT(YEAR FROM d) notes"
    assert row["n_true"] == 1
    assert row["sdiv"] is None
    assert row["scast"] is None
    assert str(row["nxt"]) == "2025-01-02"


def test_day_spine_rewrite_skips_literal_but_fires_outside(spark):
    """The one supported UNNEST(GENERATE_DATE_ARRAY(...)) form still
    rewrites outside quotes while an embedded copy inside a literal in the
    SAME statement survives verbatim."""
    stmt = (
        "SELECT day, 'UNNEST(GENERATE_DATE_ARRAY(\\'2020-01-01\\', "
        "\\'2020-01-02\\', INTERVAL 1 DAY)) AS d' AS note "
        "FROM UNNEST(GENERATE_DATE_ARRAY('2025-03-01', '2025-03-03', "
        "INTERVAL 1 DAY)) AS day"
    )
    out = sql_dialect.translate_statement(stmt)
    assert "explode(sequence(to_date('2025-03-01')" in out
    assert "GENERATE_DATE_ARRAY(\\'2020-01-01\\'" in out  # literal intact
    rows = spark.sql(out).collect()
    assert [str(r["day"]) for r in rows] == ["2025-03-01", "2025-03-02", "2025-03-03"]
    assert rows[0]["note"].startswith("UNNEST(GENERATE_DATE_ARRAY(")
