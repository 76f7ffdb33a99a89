"""Local replica of the driver's DuckDB-oracle differential check:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # deliberately NOT collapsing whole floats to ints: a long on one
        # side vs a whole double on the other is a type misalignment the
        # driver's comparison may not forgive — surface it here instead
        if math.isnan(v):
            return "NULL"
        return f"{round(v, 6):.6f}"
    if isinstance(v, datetime):
        return v.date().isoformat() if v.time() == datetime.min.time() else v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return _norm_value(float(v))
    except ImportError:  # pragma: no cover
        pass
    return str(v)


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows — the driver's
    order-insensitive comparison shape."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diff_s = [r for r in sn if r not in set(dn)][:5]
        diff_d = [r for r in dn if r not in set(sn)][:5]
        return False, f"values differ; spark-only={diff_s} duckdb-only={diff_d}"
    return True, "ok"
