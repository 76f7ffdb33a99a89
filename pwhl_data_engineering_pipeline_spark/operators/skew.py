"""Skew-handling operators: salted aggregation and salted joins.

AQE's skew-join splitting (on by default in the engine session) handles most
runtime skew; these explicit forms cover the cases AQE can't: a hot *grouping*
key whose partial-aggregate state is itself huge (e.g. collect_list-style
aggs), and broadcast-infeasible joins against a skewed build side. Both are
standard two-stage rewrites expressed purely in DataFrame ops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: spec: output name → (input column expr, combinable agg kind)
AggSpec = dict[str, tuple[Column, str]]

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_FINAL = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _content_salt(
    df: DataFrame, salt_cols: Sequence[str] | None, salt_buckets: int, seed: int
) -> Column:
    """Deterministic salt from row CONTENT, not from a nondeterministic
    expression. ``monotonically_increasing_id()``/``rand()`` feeding a
    shuffle is the classic partial-stage-retry hazard: a recomputed task
    re-salts its rows differently and the retried shuffle map output no
    longer matches what reducers already fetched — rows silently lost or
    duplicated. Hashing the row's own columns is retry-stable. Exact
    duplicate rows share a salt (they collapse into the same partial
    aggregate), so spreading degrades only for corpora dominated by
    byte-identical rows — pass higher-cardinality ``salt_cols`` there."""
    cols = list(salt_cols) if salt_cols else list(df.columns)
    return F.pmod(F.xxhash64(F.lit(seed), *[F.col(c) for c in cols]), F.lit(salt_buckets))


def salted_rollup(
    df: DataFrame,
    keys: Sequence[str],
    aggs: AggSpec,
    salt_buckets: int = 16,
    seed: int = 42,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation over a salted key: stage 1 aggregates on
    (keys, salt) spreading a hot key over ``salt_buckets`` reducers; stage 2
    combines partials on the true key. Only algebraic aggregates (sum, count,
    min, max) are legal — avg is sum/count composed by the caller.

    Equivalent to ``df.groupBy(keys).agg(...)`` for these aggregates; the
    win is when one key dominates: stage 1 shuffle spreads it evenly and
    stage 2 only moves ``salt_buckets`` pre-aggregated rows per key.

    The salt is a content hash (see ``_content_salt``) — deterministic under
    task retry. ``salt_cols`` defaults to all columns; pass a unique-ish
    subset (e.g. an id column) when rows duplicate heavily.
    """
    for name, (_, kind) in aggs.items():
        if kind not in _PARTIAL:
            raise ValueError(f"{name}: non-algebraic agg {kind!r} cannot be salted")
    salt = _content_salt(df, salt_cols, salt_buckets, seed)
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[_PARTIAL[kind](col).alias(name) for name, (col, kind) in aggs.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[_FINAL[kind](F.col(name)).alias(name) for name, (_, kind) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 42,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join for a non-broadcastable dimension: the fact side
    gets a content-derived salt (retry-stable — see ``_content_salt``), the
    dim side is replicated ``salt_buckets``× with an exploded salt column,
    and the join runs on (keys, salt) — a hot key's rows land on
    ``salt_buckets`` reducers instead of one.

    Cost: dim shuffle volume × salt_buckets. Use only when the dim is too
    big to broadcast AND a key is hot enough that AQE's skew splitting
    (which handles the sort-merge case automatically) isn't available.
    """
    salted_fact = fact.withColumn("__salt", _content_salt(fact, salt_cols, salt_buckets, seed))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast(salted_fact.schema["__salt"].dataType))
    out = salted_fact.join(replicated_dim, [*on, "__salt"], how)
    return out.drop("__salt")
