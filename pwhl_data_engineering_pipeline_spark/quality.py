"""Data-quality Contract API — SURVEY.md §2.9 V1-V7, the reference's
distinctive operators, re-expressed for a lazy engine.

The reference aborts stages on schema/duplicate-key violations
(scripts/clean_ticket_sales.py:80-88,116-119) and validates join cardinality
with pandas ``validate="m:1"`` (scripts/transform_weather.py:95). In a lazy
engine those checks force eager actions mid-pipeline, so they are gated
behind a mode (SURVEY.md §7.4 item 8):

- ``strict``  — run every check eagerly, raise ``ContractViolation`` (CI /
  small-SF correctness runs).
- ``warn``    — run checks, log, continue.
- ``off``     — no actions triggered; the 100 TB path skips or samples.

Checks that only need the *right* side of a join (m:1) stay cheap at scale:
dimension sides are small, so the uniqueness count is a broadcast-sized agg.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .sources.readers import local_frame

log = logging.getLogger("pwhl_spark.quality")


class ContractViolation(RuntimeError):
    """A strict-mode data contract failed."""


@dataclass
class Contract:
    """Eager validation harness with strict/warn/off modes."""

    mode: str = "strict"  # strict | warn | off
    #: sample fraction for expensive checks in warn mode at scale (None = full)
    sample_fraction: float | None = None
    counters: dict[str, int] = field(default_factory=dict)

    # -- internals ---------------------------------------------------------

    def _maybe_sample(self, df: DataFrame) -> DataFrame:
        if self.sample_fraction is not None and self.mode != "strict":
            return df.sample(self.sample_fraction, seed=42)
        return df

    def _fail(self, name: str, message: str) -> None:
        if self.mode == "strict":
            raise ContractViolation(f"{name}: {message}")
        log.warning("%s: %s", name, message)

    # -- V1: required-column schema check ----------------------------------

    def require_columns(self, df: DataFrame, required: Sequence[str], name: str = "schema") -> DataFrame:
        """V1 (transform_weather.py:67-71, clean_ticket_sales.py:80-88).
        Pure metadata — free at any scale."""
        missing = set(required) - set(df.columns)
        if missing:
            self._fail(name, f"missing required columns: {sorted(missing)}")
        return df

    # -- V2: key-uniqueness ------------------------------------------------

    def require_unique_key(self, df: DataFrame, keys: Sequence[str], name: str = "unique_key") -> DataFrame:
        """V2 (clean_ticket_sales.py:116-119, integrate_weather_sales.py:122-126).
        One shuffle on the key; map-side partial agg keeps it cheap."""
        if self.mode == "off":
            return df
        dupes = (
            self._maybe_sample(df)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 1)
        )
        n = dupes.limit(1).count()
        if n > 0:
            sample = [r.asDict() for r in dupes.limit(5).collect()]
            self._fail(name, f"duplicate keys on {list(keys)}; sample: {sample}")
        return df

    # -- V3: m:1 join cardinality ------------------------------------------

    def require_m1(self, right: DataFrame, keys: Sequence[str], name: str = "m:1") -> DataFrame:
        """V3 — pandas ``validate="m:1"`` parity (transform_weather.py:95):
        the join's right side must be unique on the join keys. Right sides
        are dimensions here, so this is a tiny aggregate."""
        return self.require_unique_key(right, keys, name=name)

    # -- V4: cross-field integrity -----------------------------------------

    def check_integrity(self, df: DataFrame, predicate: Column, name: str = "integrity") -> DataFrame:
        """V4 (clean_ticket_sales.py:97-101): count rows violating a
        cross-field predicate; warn with the count (never aborts — matches
        the reference's warn-only behavior)."""
        if self.mode == "off":
            return df
        bad = self._maybe_sample(df).filter(~F.coalesce(predicate, F.lit(False))).count()
        self.counters[name] = bad
        if bad:
            log.warning("%s: %d rows violate the integrity predicate", name, bad)
        return df

    # -- V5: null-rate sanity ----------------------------------------------

    def check_null_rate(self, df: DataFrame, cols: Sequence[str], name: str = "null_rate") -> dict[str, int]:
        """V5 (clean_section_capacity.py:97-103): count unparsable/null
        values per column in ONE pass (single job, conditional sums)."""
        if self.mode == "off":
            return {}
        row = (
            self._maybe_sample(df)
            .agg(*[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols])
            .collect()[0]
        )
        rates = {c: int(row[c] or 0) for c in cols}
        for c, n in rates.items():
            self.counters[f"{name}.{c}"] = n
            if n:
                log.warning("%s: column %s has %d null/unparsable values", name, c, n)
        return rates

    # -- V6: config completeness -------------------------------------------

    def require_config_count(self, rows: Sequence, expected: int, name: str = "config") -> None:
        """V6 (ingest_weather.py:74-76): driver-side config sanity."""
        if len(rows) != expected:
            self._fail(name, f"expected {expected} config rows, got {len(rows)}")

    # -- V7: row-count reconciliation --------------------------------------

    def reconcile_counts(self, name: str, df: DataFrame) -> DataFrame:
        """V7 (transform_weather.py:97-98, integrate_weather_sales.py:104):
        structured row-count logging. In off mode this is a no-op so the
        scale path triggers no extra jobs."""
        if self.mode == "off":
            return df
        n = df.count()
        self.counters[name] = n
        log.info("rows[%s] = %d", name, n)
        return df


# -- row-level quarantine (lazy; no Contract mode needed) -------------------

def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Row-level validation routing: split ``df`` into (good, bad).

    ``rules`` maps rule name → boolean Column; a row is *good* iff every
    rule evaluates TRUE (NULL counts as a failure — an unevaluable rule is
    a dirty row, matching SQL CHECK-constraint semantics). ``bad`` carries a
    ``violations`` array<string> naming each failed rule, so the quarantine
    table is self-describing for triage/replay.

    Unlike the Contract API (eager, abort-the-stage semantics mirroring the
    reference's clean_ticket_sales.py:80-88 aborts), this is the LAZY
    dead-letter shape for continuous pipelines: pure column expressions, no
    action, fully distributed. Each returned frame filters the same
    projection, so a consumer that materializes both pays two scans — at
    scale, write once partitioned by ``size(violations) == 0`` instead, or
    persist the flagged frame before splitting.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    if "violations" in df.columns:
        # Re-quarantining an already-labeled bad frame would silently
        # clobber (good) or overwrite (bad) the historical labels.
        raise ValueError(
            "input already has a 'violations' column — rename it first "
            "(e.g. withColumnRenamed) to keep prior labels"
        )
    viol = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in rules.items()
            ]
        )
    )
    flagged = df.withColumn("violations", viol)
    good = flagged.filter(F.size("violations") == 0).drop("violations")
    bad = flagged.filter(F.size("violations") > 0)
    return good, bad


def profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Column-level data profile: one row per column with row/null counts,
    approximate distinct count, and min/max (rendered as strings so one
    schema serves every column type) — the first-look diagnostic before
    writing contracts or choosing join/partition keys.

    ONE aggregation job over the input regardless of column count (all
    per-column aggregates ride a single pass; map-side partial
    aggregation applies), then a driver-side pivot of the 1-row result
    into the per-column frame — no per-column jobs, no toPandas of data.
    Distinct counts use HyperLogLog (approx_count_distinct, ~2% default
    error): exact distincts per column would add a shuffle per column.

    Columns are referenced backtick-quoted (exact-name resolution), so
    names containing dots profile as themselves instead of being parsed as
    struct paths; non-orderable/non-hashable types (maps) skip min/max and
    the distinct sketch and report NULLs there instead of raising.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    dtypes = dict(df.dtypes)
    orderable = {c: not dtypes[c].startswith("map<") for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    def _q(name: str):  # exact-name reference: `a.b` is a column, not a path
        return F.col("`" + name.replace("`", "``") + "`")

    for i, c in enumerate(cols):
        aggs.append(F.sum(_q(c).isNull().cast("long")).alias(f"__nulls_{i}"))
        if orderable[c]:
            aggs += [
                F.approx_count_distinct(_q(c)).alias(f"__dist_{i}"),
                F.min(_q(c)).cast("string").alias(f"__min_{i}"),
                F.max(_q(c)).cast("string").alias(f"__max_{i}"),
            ]
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    spark = df.sparkSession
    out = [
        (
            c,
            dtypes[c],
            n,
            row[f"__nulls_{i}"],
            (row[f"__nulls_{i}"] / n) if n else 0.0,
            row[f"__dist_{i}"] if orderable[c] else None,
            row[f"__min_{i}"] if orderable[c] else None,
            row[f"__max_{i}"] if orderable[c] else None,
        )
        for i, c in enumerate(cols)
    ]
    return local_frame(spark, 
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "null_rate double, approx_distinct long, min string, max string",
    )
