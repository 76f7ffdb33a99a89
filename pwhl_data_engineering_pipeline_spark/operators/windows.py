"""Window-function layer — SURVEY.md §2.5.

The reference has no OVER clauses; this thin layer exists because the
north-star operators (per-group top-k similarity, dedup ranking) need it.
Every helper keeps the partition key explicit — an unpartitioned window is a
single-task bottleneck and is refused.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _require_partition(partition_by: Sequence) -> None:
    if not partition_by:
        raise ValueError(
            "window operators require a partition key; an unpartitioned "
            "window funnels all rows through one task at 100 TB"
        )


def ranked(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    rank_col: str = "rn",
) -> DataFrame:
    """row_number() over (partition by ... order by ...)."""
    _require_partition(partition_by)
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via row_number + filter. AQE coalesces the shuffle;
    ties are broken by the caller's order_by (append a unique key for
    determinism)."""
    return ranked(df, partition_by, order_by, rank_col).filter(F.col(rank_col) <= k)


def dedup_rank(
    df: DataFrame,
    keys: Sequence[str | Column],
    keep_order: Sequence[Column],
) -> DataFrame:
    """Keep exactly one row per key, the first under ``keep_order`` —
    deterministic dropDuplicates (which itself keeps an arbitrary row)."""
    return top_k_per_group(df, keys, keep_order, 1).drop("rn")
