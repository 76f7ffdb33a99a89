"""As-of (point-in-time) join — an operator Spark lacks natively,
composed from union + window (SURVEY.md §2.3 notes the reference has no
as-of/range joins; this is a north-star extension for event/feature
pipelines: "latest dimension value as of the fact timestamp").

Algorithm (the shuffle-optimal composition):
  1. Tag left rows side=1, right rows side=0; union on (keys, ts, payload).
  2. One window per key ordered by (ts, side): ``last(payload STRUCT,
     ignorenulls)`` over unbounded-preceding..current carries the most
     recent right ROW forward — the struct keeps all payload columns from
     the same matched row, and a matched row's NULL values stay NULL
     instead of reaching back to an older non-null row. Right sorts before
     left at equal ts → backward join is inclusive (right.ts <= left.ts).
  3. Keep left rows.

Exactly ONE shuffle on the join keys — same cost as a co-partitioned merge
join, with no range-condition blowup. This matches DuckDB/kdb ASOF JOIN
semantics and is oracle-checked against DuckDB's native ASOF JOIN.

The right side must be unique per (keys, ts) — enforceable with
``windows.dedup_rank`` upstream; ambiguous duplicates make every as-of
implementation order-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """Backward-inclusive as-of join: for every left row, attach the right
    payload with the greatest ``right_ts`` <= ``left_ts`` within the key.
    Unmatched left rows keep NULL payload (left-join semantics)."""
    clash = set(right_payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_payload columns collide with left columns: {sorted(clash)}; "
            "rename the payload columns before the as-of join"
        )
    lcols = left.columns
    # The whole payload travels as ONE struct so the carry picks the payload
    # of a single right row atomically. Carrying each column separately with
    # last(col, ignorenulls) would (a) reach past a matched row whose value
    # is NULL back to an older non-null row, and (b) let different payload
    # columns come from different right rows — both deviations from
    # DuckDB/kdb ASOF JOIN semantics. A right row with NULL values is still
    # a non-null struct, so it correctly overrides older values with NULL.
    rtypes = dict(right.dtypes)
    struct_ddl = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in right_payload) + ">"
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__r", F.lit(None).cast(struct_ddl))
    )

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__r"),
    )
    for c in lcols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes).get(c, "string")))

    unioned = l.select(*lcols, "__ts", "__side", "__r").unionByName(
        r.select(*lcols, "__ts", "__side", "__r")
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__m")
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col("__m")[c].alias(c) for c in right_payload]
    )
