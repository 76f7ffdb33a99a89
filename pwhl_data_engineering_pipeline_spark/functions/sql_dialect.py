"""BigQuery → Spark SQL dialect translation (SURVEY.md §3 EP3).

The reference's query layer is BigQuery Standard SQL files run manually in
the warehouse console (sql/02_create_dims_and_facts.sql, 03_create_views.sql,
10_eda_queries.sql). This translator lets a user of the reference run those
same files on the engine unchanged — the dialect deltas are mechanical:

- backticked ``project.dataset.table`` names → bare table names
- ``SAFE_DIVIDE`` → ``try_divide``; ``COUNTIF`` → ``count_if``
- ``FORMAT_DATE('%A', d)`` → ``date_format(d, 'EEEE')``
- ``EXTRACT(ISOWEEK FROM d)`` → ``weekofyear(d)``
- ``FROM UNNEST(GENERATE_DATE_ARRAY(a, b, INTERVAL 1 DAY)) AS day`` →
  ``FROM (SELECT explode(sequence(to_date(a), to_date(b), interval 1 day)) AS day)``
- ``CREATE SCHEMA ... OPTIONS(...)`` → ``CREATE DATABASE IF NOT EXISTS ...``
- CTAS ``PARTITION BY / CLUSTER BY`` headers → ``USING parquet PARTITIONED
  BY`` (table mode) or stripped (temp-view mode, the default for tests)

SCOPE: the translator is regex-based and scoped to the dialect constructs
the reference's three SQL files actually use — it is not a general BigQuery
parser. Known sharp edges for SQL beyond that scope: ``FORMAT_DATE`` with a
nested-paren date expression (``FORMAT_DATE('%A', DATE(x))``) breaks the
``[^)]+`` argument match, and ``split_statements`` splits on every ``;``
including one inside a string literal. Feeding arbitrary BigQuery scripts
through ``run_bigquery_script`` requires hardening these (balanced-paren and
quote-aware parsing); the translated output is always plain Spark SQL, so
misses surface as Spark analysis errors, not silent wrong results.

One *documented deviation* (SURVEY.md §7.4 item 4): the reference's viz
queries join ``USING (weather_id)`` but no script ever materializes that
column — they cannot run against the reference's own tables. With
``repair_weather_id=True`` the translator mints
``concat_ws('|', market, cast(event_date AS string))`` on ``dim_weather``
and ``fact_ticket_sales`` so the declared star schema actually works.
"""

from __future__ import annotations

import re

_DATE_ARRAY_RE = re.compile(
    r"UNNEST\s*\(\s*GENERATE_DATE_ARRAY\s*\(\s*('(?:[^']*)')\s*,\s*('(?:[^']*)')\s*,"
    r"\s*INTERVAL\s+1\s+DAY\s*\)\s*\)\s*AS\s+(\w+)",
    re.IGNORECASE,
)
_FORMAT_DATE_RE = re.compile(r"FORMAT_DATE\s*\(\s*'%A'\s*,\s*([^)]+)\)", re.IGNORECASE)
_ISOWEEK_RE = re.compile(r"EXTRACT\s*\(\s*ISOWEEK\s+FROM\s+([^)]+)\)", re.IGNORECASE)
_QUALIFIED_NAME_RE = re.compile(r"`[\w.-]+\.(\w+)`")
_CTAS_RE = re.compile(
    r"CREATE\s+OR\s+REPLACE\s+TABLE\s+(\w+)\s*"
    r"(?:PARTITION\s+BY\s+[\w()]+\s*)?(?:CLUSTER\s+BY\s+[\w,\s]+?)?\s*AS",
    re.IGNORECASE,
)
_CVIEW_RE = re.compile(r"CREATE\s+OR\s+REPLACE\s+VIEW\s+(\w+)\s+AS", re.IGNORECASE)
_SCHEMA_RE = re.compile(
    r"CREATE\s+SCHEMA\s+IF\s+NOT\s+EXISTS\s+`?([\w.-]+)`?(\s+OPTIONS\s*\([^)]*\))?",
    re.IGNORECASE | re.DOTALL,
)

#: CTAS targets that receive the minted surrogate key in repair mode →
#: (column expression appended to the SELECT list)
_WEATHER_ID_REPAIRS = {
    "dim_weather": "concat_ws('|', market, cast(event_date AS string)) AS weather_id",
    # weather_id only — exposing a carried `market` column would make the
    # viz queries' bare `GROUP BY market` ambiguous against dim_weather
    "fact_ticket_sales": (
        "concat_ws('|', any_value(market), cast(event_date AS string)) AS weather_id"
    ),
}


def split_statements(sql_text: str) -> list[str]:
    """Split a BigQuery script into statements; drop comment-only chunks."""
    out = []
    for stmt in sql_text.replace("﻿", "").split(";"):
        body = "\n".join(
            line for line in stmt.splitlines() if not line.strip().startswith("--")
        ).strip()
        if body:
            out.append(body)
    return out


def translate_statement(
    sql: str, mode: str = "view", repair_weather_id: bool = True
) -> str:
    """Translate one BigQuery statement to Spark SQL.

    ``mode="view"`` turns CTAS/CREATE VIEW into temp views (hermetic test
    execution); ``mode="table"`` emits real parquet CTAS.
    """
    s = _QUALIFIED_NAME_RE.sub(r"\1", sql)

    m = _SCHEMA_RE.search(s)
    if m:
        name = m.group(1).split(".")[-1]
        props = []
        opts = m.group(2) or ""
        ttl = re.search(r"default_table_expiration_days\s*=\s*(\d+)", opts, re.IGNORECASE)
        if ttl:
            # runtime counterpart: writers.vacuum_expired drops tables past
            # this TTL (BigQuery auto-expires them server-side)
            props.append(f"'default_table_expiration_days'='{ttl.group(1)}'")
        loc = re.search(r"location\s*=\s*'([^']*)'", opts, re.IGNORECASE)
        if loc:
            # a BigQuery *region*, not a filesystem path — recorded for
            # fidelity, not interpreted (Spark LOCATION means a warehouse dir)
            props.append(f"'bq.location'='{loc.group(1)}'")
        with_props = f" WITH DBPROPERTIES ({', '.join(props)})" if props else ""
        return f"CREATE DATABASE IF NOT EXISTS {name}{with_props}"

    ctas = _CTAS_RE.search(s)
    target = ctas.group(1) if ctas else None
    if ctas:
        if mode == "view":
            s = _CTAS_RE.sub(rf"CREATE OR REPLACE TEMPORARY VIEW {target} AS", s)
        else:
            part = re.search(r"PARTITION\s+BY\s+(?:DATE\()?(\w+)\)?", sql, re.IGNORECASE)
            header = f"CREATE OR REPLACE TABLE {target} USING parquet"
            if part:
                header += f" PARTITIONED BY ({part.group(1)})"
            s = _CTAS_RE.sub(header + " AS", s)
    else:
        cv = _CVIEW_RE.search(s)
        if cv and mode == "view":
            s = _CVIEW_RE.sub(rf"CREATE OR REPLACE TEMPORARY VIEW {cv.group(1)} AS", s)

    s = _FORMAT_DATE_RE.sub(r"date_format(\1, 'EEEE')", s)
    s = _ISOWEEK_RE.sub(r"weekofyear(\1)", s)
    s = _DATE_ARRAY_RE.sub(
        r"(SELECT explode(sequence(to_date(\1), to_date(\2), interval 1 day)) AS \3)", s
    )
    s = re.sub(r"\bSAFE_DIVIDE\b", "try_divide", s, flags=re.IGNORECASE)
    s = re.sub(r"\bCOUNTIF\b", "count_if", s, flags=re.IGNORECASE)

    if repair_weather_id and target in _WEATHER_ID_REPAIRS:
        # append the minted key at the END of the SELECT list (before FROM)
        # so GROUP BY ordinals keep their meaning
        inject = _WEATHER_ID_REPAIRS[target]
        s = re.sub(r"\nFROM\b", f",\n  {inject}\nFROM", s, count=1)
    return s


def run_bigquery_script(spark, sql_text: str, mode: str = "view", repair_weather_id: bool = True):
    """Translate + execute every statement of a BigQuery script in order;
    returns the list of result DataFrames (one per statement)."""
    results = []
    for stmt in split_statements(sql_text):
        results.append(spark.sql(translate_statement(stmt, mode, repair_weather_id)))
    return results
