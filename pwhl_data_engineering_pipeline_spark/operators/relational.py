"""Relational core — projections/filters (SURVEY.md §2.2 P1-P12), joins
(§2.3 J1-J8), sorts/limits (§2.6 O1-O4), unions (§2.7 U1).

These are thin, composable wrappers that keep plans declarative so Catalyst
owns physical strategy: column pruning and predicate pushdown come free;
small dimension sides get an explicit ``broadcast`` hint (the reference's
dims are ≤600 rows — scripts/clean_section_capacity.py, config/markets.yml);
AQE handles skew.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..quality import Contract

# -- Projections (P1-P4) ----------------------------------------------------

def select_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P1: select + reorder."""
    return df.select(*cols)


def stamp_literals(df: DataFrame, **values) -> DataFrame:
    """P2: add literal columns (source stamping, ingest_weather.py:92-93)."""
    return df.withColumns({k: F.lit(v) for k, v in values.items()})


def conform_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """P3 + schema conform: add missing columns as typed NULLs, cast the
    rest, order per schema (materialize_dim_market.py:21-25)."""
    out = []
    for f in schema.fields:
        if f.name in df.columns:
            out.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            out.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*out)


# -- Joins (J1-J8) ----------------------------------------------------------

def join_enrich(
    df: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
    broadcast_dim: bool = True,
    contract: Contract | None = None,
    m1_keys: Sequence[str] | None = None,
) -> DataFrame:
    """J1/J2/J4/J5/J7: enrichment join against a dimension, optionally
    m:1-validated (pandas ``validate="m:1"`` parity, V3) and broadcast.

    ``on`` is a key list (equi, USING-style: J6) or a Column (compound ON:
    J7 — sql/03_create_views.sql:41-43)."""
    if contract is not None and m1_keys is not None:
        contract.require_m1(dim, m1_keys)
    right = F.broadcast(dim) if broadcast_dim else dim
    return df.join(right, on, how)


def cross_join(df: DataFrame, other: DataFrame) -> DataFrame:
    """J3: replicate-per-market cross join
    (clean_section_capacity.py:105-108 uses a constant-key merge; Spark has
    the real operator)."""
    return df.crossJoin(F.broadcast(other))


def mint_surrogate_key(df: DataFrame, key_name: str, natural_keys: Sequence[str]) -> DataFrame:
    """J8 repair: mint the surrogate key the reference declares but never
    materializes (SURVEY.md §7.4 item 4)."""
    from ..functions.scalars import surrogate_key

    return df.withColumn(key_name, surrogate_key(*natural_keys))


# -- Sorts / limits (O1-O4) -------------------------------------------------

def sort_by(df: DataFrame, cols: Sequence[str | Column]) -> DataFrame:
    """O1/O2: global sort (only meaningful before a bounded output — at
    scale prefer sortWithinPartitions on write)."""
    return df.orderBy(*cols)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O3: ORDER BY ... LIMIT k — Spark plans TakeOrderedAndProject (no full
    sort; per-partition heaps + driver merge), the right 100 TB top-k."""
    return df.orderBy(*order).limit(k)


# -- Set ops (U1) -----------------------------------------------------------

def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """U1: positional-safe vertical concat (ingest_weather.py:103)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)
