"""Scalar expression kit — the reference's complete scalar surface as named
Column builders (SURVEY.md §2.8, F1-F20). Pure functions: Column in, Column
out; no UDFs, everything stays inside whole-stage codegen.

Reference citations (files under /root/reference):
- slugify: scripts/transform_weather.py:21-26
- multi-format date parse: scripts/clean_ticket_sales.py:91 (M/D/YYYY raw,
  data/raw/pwhl_ticket_sales.csv:2) + ISO cleaned intermediates
- coercing numeric casts: scripts/integrate_weather_sales.py:33-40
- SAFE_DIVIDE / NULLIF: sql/02_create_dims_and_facts.sql:106-108
- banding / IF / CASE: sql/10_eda_queries.sql:34,51-59,155
- date parts / weekday / ISO week / date array:
  sql/02_create_dims_and_facts.sql:61-65
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- F1-F8: string kit ------------------------------------------------------

def clean_string(c: ColumnOrName) -> Column:
    """trim + collapse internal whitespace (clean_ticket_sales.py:38-40)."""
    return F.regexp_replace(F.trim(_col(c).cast("string")), r"\s+", " ")


def norm_section(c: ColumnOrName) -> Column:
    """Section normalization: trim, collapse whitespace, title-case
    (clean_ticket_sales.py:38-41, clean_section_capacity.py:41-43).

    ``initcap`` capitalizes after whitespace — identical to pandas
    ``.str.title()`` on the observed vocabulary (SURVEY.md §2.8 F5).
    """
    return F.initcap(clean_string(c))


def slugify(*cols: ColumnOrName, sep: str = "_") -> Column:
    """Join parts, lower, replace non-alnum runs with '_', strip edge '_'
    (transform_weather.py:21-26) — natively, no UDF."""
    joined = F.lower(F.concat_ws(sep, *[_col(c) for c in cols]))
    slug = F.regexp_replace(joined, r"[^a-z0-9]+", "_")
    return F.regexp_replace(slug, r"^_+|_+$", "")


def normalize_column_names(names: list[str]) -> list[str]:
    """Driver-side column-name normalization: strip/lower/underscore
    (clean_ticket_sales.py:28-35)."""
    return ["_".join(n.strip().lower().split()) for n in names]


# -- F9-F10: coercing parsers ----------------------------------------------

def to_date_multi(c: ColumnOrName) -> Column:
    """Parse dates in either raw ``M/D/YYYY`` or ISO ``YYYY-MM-DD`` form,
    NULL on failure — pandas ``to_datetime(errors="coerce")`` semantics
    (clean_ticket_sales.py:91; SURVEY.md §7.4 item 3)."""
    col = F.trim(_col(c).cast("string"))
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("M/d/yyyy")).cast("date"),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")).cast("date"),
        F.try_to_timestamp(col).cast("date"),
    )


def to_timestamp_coerce(c: ColumnOrName, fmt: str | None = None) -> Column:
    """``pd.to_datetime(errors="coerce")`` → NULL on bad input."""
    if fmt is None:
        return F.try_to_timestamp(F.trim(_col(c).cast("string")))
    return F.try_to_timestamp(F.trim(_col(c).cast("string")), F.lit(fmt))


def to_double_coerce(c: ColumnOrName) -> Column:
    """``pd.to_numeric(errors="coerce").astype(float64)``."""
    return _col(c).cast("string").try_cast("double")


def to_long_coerce(c: ColumnOrName) -> Column:
    """``pd.to_numeric(errors="coerce").astype("Int64")`` — nullable int.
    Values like "4.0" round-trip through double, matching pandas."""
    return _col(c).cast("string").try_cast("double").try_cast("long")


# -- F11, F16-F20: math / conditionals -------------------------------------

def round2(c: ColumnOrName) -> Column:
    return F.round(_col(c), 2)


def round2_half_even(c: ColumnOrName) -> Column:
    """pandas/numpy ``.round(2)`` parity: numpy computes ``rint(x*100)/100``
    — half-even on the *double product*, where e.g. −13.825000000000001×100
    collapses to exactly −1382.5 and rounds to the even −1382. Neither
    Spark's ``round`` (half-up on shortest repr) nor plain ``bround(x, 2)``
    (half-even on shortest repr of x) reproduces that; ``bround(x*100, 0)``
    does, because the scaled product's shortest repr decides exactly like
    rint. Required for bit-parity with the reference's pandas-built goldens
    (verified against data/cleaned/weather_daily_by_venue.csv)."""
    return F.bround(_col(c) * F.lit(100.0), 0) / F.lit(100.0)


def portable_round(c: ColumnOrName, n: int = 2) -> Column:
    """Cross-engine-deterministic rounding: ``floor(x·10ⁿ + 0.5)/10ⁿ``.

    ``ROUND`` on doubles is engine-defined at representation boundaries —
    Spark rounds the shortest decimal repr (BigDecimal.valueOf) while e.g.
    DuckDB rounds the true binary value, so 8285.42499…→ .43 vs .42. This
    formula uses only IEEE multiply/add/floor, which every engine computes
    bit-identically, making differential testing (DuckDB oracle) exact.
    Half-way values round toward +∞ (identically everywhere).
    """
    s = float(10**n)
    return F.floor(_col(c) * F.lit(s) + F.lit(0.5)) / F.lit(s)


def safe_divide(num: ColumnOrName, den: ColumnOrName) -> Column:
    """BigQuery SAFE_DIVIDE: NULL on 0/NULL denominator
    (sql/02_create_dims_and_facts.sql:106-108)."""
    return F.try_divide(_col(num), _col(den))


def nullif_zero(c: ColumnOrName) -> Column:
    return F.nullif(_col(c), F.lit(0))


def numeric_bin(c: ColumnOrName, width: float) -> Column:
    """``ROUND(x / w) * w`` binning (sql/10_eda_queries.sql:155)."""
    return F.round(_col(c) / F.lit(width)) * F.lit(width)


def flag(cond: Column) -> Column:
    """Boolean condition → 0/1 Int flag (transform_weather.py:117-122)."""
    return cond.cast("int")


def band(
    c: ColumnOrName,
    bands: list[tuple[float | None, float | None, str]],
    null_label: str = "Unknown",
) -> Column:
    """Multi-way CASE/BETWEEN banding (sql/10_eda_queries.sql:51-59).

    ``bands`` is a list of (lo, hi, label); lo/hi are inclusive bounds, None
    means unbounded on that side. NULL input → ``null_label``.
    """
    col = _col(c)
    expr = F.when(col.isNull(), F.lit(null_label))
    for lo, hi, label in bands:
        if lo is None and hi is None:
            cond = F.lit(True)
        elif lo is None:
            cond = col <= F.lit(hi)
        elif hi is None:
            cond = col >= F.lit(lo)
        else:
            cond = col.between(F.lit(lo), F.lit(hi))
        expr = expr.when(cond, F.lit(label))
    return expr.otherwise(F.lit(null_label))


# -- F12-F15: date kit ------------------------------------------------------

def weekday_name(c: ColumnOrName) -> Column:
    """``FORMAT_DATE('%A', d)`` (sql/02_create_dims_and_facts.sql:63)."""
    return F.date_format(_col(c), "EEEE")


def iso_week(c: ColumnOrName) -> Column:
    """``EXTRACT(ISOWEEK FROM d)`` — Spark weekofyear is ISO
    (sql/02_create_dims_and_facts.sql:64)."""
    return F.weekofyear(_col(c))


def date_sequence(start: str, end: str) -> Column:
    """``GENERATE_DATE_ARRAY(start, end, INTERVAL 1 DAY)``
    (sql/02_create_dims_and_facts.sql:65). Explode the result to UNNEST."""
    return F.sequence(
        F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 1 day")
    )


def surrogate_key(*cols: ColumnOrName) -> Column:
    """Deterministic surrogate key from natural-key columns.

    The reference's star schema declares a ``weather_id`` that no script ever
    materializes (README.md:195,204 vs sql/02_create_dims_and_facts.sql:72-110
    — SURVEY.md §7.4 item 4); we mint it so the declared schema actually
    works. A portable string key (pipe-joined natural key) keeps it
    oracle-checkable; use :func:`surrogate_key_hash` when a compact int64 key
    is preferred at scale.
    """
    return F.concat_ws("|", *[_col(c).cast("string") for c in cols])


def surrogate_key_hash(*cols: ColumnOrName) -> Column:
    """xxhash64-based int64 surrogate key — the scale-path variant."""
    return F.xxhash64(*[_col(c).cast("string") for c in cols])
