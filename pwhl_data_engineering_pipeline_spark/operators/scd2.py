"""Slowly-changing-dimension (type 2) operators: observation streams →
validity-ranged history, and change-batch application onto a current dim.

The reference materializes star-schema dims by full rebuild (BigQuery CTAS,
`sql/02_create_dims_and_facts.sql`); at 100 TB a dimension's history has to
be *maintained*, not rebuilt. Two shapes:

- ``collapse_history``: the gaps-and-islands collapse — a stream of
  (key, attribute, ts) observations becomes one row per RUN of equal
  attribute values with [valid_from, valid_to) ranges. One window shuffle on
  key; everything else is map-side. This is also the general "user state
  history" / session-attribute timeline operator.
- ``scd2_apply``: apply a batch of changed rows to a current SCD2 dim —
  close out superseded versions (valid_to = effective ts, is_current =
  false), append the new versions. Pure unions + a broadcast-able semi
  structure: the updates batch is small next to the dim.

Both are deterministic and SQL-expressible, so the collapse is
driver-oracle-checked (`s_scd2_history` in ``__spark_entry__``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["collapse_history", "scd2_apply"]


def collapse_history(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_col: str,
    ts_col: str,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Collapse an observation stream into SCD2 validity ranges.

    One output row per maximal run of consecutive equal ``attr_col`` values
    within each key: (keys, attr, valid_from = first ts of the run,
    valid_to = first ts of the NEXT run or NULL for the current run,
    n_observations). Ranges are half-open [valid_from, valid_to).

    Plan shape: a single hash shuffle on ``key_cols`` feeds all three
    windows (change flag via lag, run id via running sum, next-run start via
    lead) — Catalyst collapses same-partitioning windows into one exchange,
    so the cost at 100 TB is one shuffle of (keys, attr, ts), nothing else.
    """
    order = [ts_col, *order_tiebreak]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.when(
        F.lag(F.col(attr_col)).over(w).eqNullSafe(F.col(attr_col)), 0
    ).otherwise(1)
    runs = df.withColumn(
        "__run",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_run = runs.groupBy(*key_cols, "__run").agg(
        F.any_value(F.col(attr_col)).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_observations"),
    )
    wr = Window.partitionBy(*key_cols).orderBy("__run")
    return (
        per_run.withColumn("valid_to", F.lead("valid_from").over(wr))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    effective_ts: Column,
) -> DataFrame:
    """Apply a change batch to a current SCD2 dimension.

    ``dim``: (keys, attrs, valid_from, valid_to, is_current). ``updates``:
    (keys, attrs) — at most one row per key (enforce upstream; a window
    dedup keeping the latest is the usual feed). Rows whose attrs are
    UNCHANGED are left untouched (no spurious versions).

    Returns the new dimension:
    - untouched keys pass through,
    - superseded current rows get valid_to = effective_ts, is_current=false,
    - changed/new keys append a fresh (valid_from = effective_ts,
      valid_to = NULL, is_current = true) version.

    The updates side is joined with ``how='left'`` from the dim plus a
    right-anti for brand-new keys — both joins broadcast when the batch is
    small (the normal case: a day's changes vs the full dim)."""
    kset = list(key_cols)
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty (nothing to compare)")
    changed_cond = None
    for a in attr_cols:
        c = ~F.col(f"d.{a}").eqNullSafe(F.col(f"u.{a}"))
        changed_cond = c if changed_cond is None else (changed_cond | c)

    d, u = dim.alias("d"), updates.alias("u")
    on = [F.col(f"d.{k}") == F.col(f"u.{k}") for k in kset]
    # NULL is_current must not vanish (it would match neither filter): treat
    # it as historical — the row passes through untouched, no data loss.
    cur = d.filter(F.col("d.is_current").eqNullSafe(F.lit(True)))
    hist = d.filter(~F.col("d.is_current").eqNullSafe(F.lit(True))).select("d.*")

    joined = cur.join(F.broadcast(u), on, "left")
    unchanged = joined.filter(
        F.col(f"u.{kset[0]}").isNull() | ~changed_cond
    ).select("d.*")
    closed = (
        joined.filter(F.col(f"u.{kset[0]}").isNotNull() & changed_cond)
        .select("d.*")
        .withColumn("valid_to", effective_ts)
        .withColumn("is_current", F.lit(False))
    )
    fresh_changed = joined.filter(
        F.col(f"u.{kset[0]}").isNotNull() & changed_cond
    ).select(*[F.col(f"u.{k}").alias(k) for k in kset],
             *[F.col(f"u.{a}").alias(a) for a in attr_cols])
    brand_new = u.join(cur, on, "left_anti").select(
        *[F.col(k) for k in kset], *[F.col(a) for a in attr_cols]
    )
    inserts = (
        fresh_changed.unionByName(brand_new)
        .withColumn("valid_from", effective_ts)
        .withColumn("valid_to", F.lit(None).cast(dict(dim.dtypes)["valid_to"]))
        .withColumn("is_current", F.lit(True))
    )
    return hist.unionByName(unchanged).unionByName(closed).unionByName(inserts)
