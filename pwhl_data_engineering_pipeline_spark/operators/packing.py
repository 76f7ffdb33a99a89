"""Sequence packing: assign documents to fixed-size context-window bins.

Training pipelines concatenate documents into fixed-length sequences
("packing") so no context window is wasted on padding. The distributed
form of greedy concat-packing is a running-sum bin assignment: order the
documents deterministically inside each independent stream, take the
cumulative token count, and a document starts in bin
``floor(cum_before / bin_size)``. That reproduces exactly what a
single-threaded concat-and-chunk loop would produce — but as ONE window
aggregation.

Scale shape: a global ordering would serialize the corpus through one
task, so packing is always per-stream (``part_cols`` — e.g. source, or
source × a deterministic hash shard via `operators.sampling._hash_bucket`)
and each stream is an independent window partition. At 100 TB you pick
shard counts so each stream's documents fit one task's spill budget; the
assignment stays bit-reproducible because both the shard and the order
are pure functions of the row (never of layout or RNG).

No counterpart in the reference (its pipeline feeds BI tables, not
training runs); part of the engine's training-data extension alongside
operators.sampling and operators.dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    size_col: str | Column,
    bin_size: int,
    *,
    order_cols: Sequence[str],
    part_cols: Sequence[str] = (),
    pack_col: str = "pack_id",
    offset_col: str | None = None,
) -> DataFrame:
    """Add a ``pack_col`` bin id (and optionally the document's start
    ``offset_col`` within the concatenated stream).

    ``order_cols`` must be a deterministic total order within each
    ``part_cols`` stream (e.g. a unique document id) — packing is only
    reproducible if the order is. Documents longer than ``bin_size`` are
    not split; they start in their natural bin and spill over, exactly
    like concat-and-chunk.
    """
    if bin_size <= 0:
        raise ValueError(f"bin_size must be positive, got {bin_size}")
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    w = Window.partitionBy(*[F.col(c) for c in part_cols]).orderBy(
        *[F.col(c) for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_before = F.sum(size).over(w) - size
    out = df.withColumn(pack_col, F.floor(cum_before / F.lit(bin_size)))
    if offset_col is not None:
        out = out.withColumn(offset_col, (cum_before % F.lit(bin_size)).cast("long"))
    return out


def pack_sql(
    size_expr: str,
    bin_size: int,
    *,
    order_cols: Sequence[str],
    part_cols: Sequence[str] = (),
) -> str:
    """ANSI-SQL expression mirroring pack_greedy's bin id — kept beside the
    implementation so the oracle recipe cannot drift."""
    part = f"PARTITION BY {', '.join(part_cols)} " if part_cols else ""
    order = ", ".join(order_cols)
    cum = (
        f"(sum({size_expr}) OVER ({part}ORDER BY {order} "
        f"ROWS UNBOUNDED PRECEDING) - {size_expr})"
    )
    return f"CAST(floor({cum} * 1.0 / {bin_size}) AS BIGINT)"


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shard",
    order_within: bool = True,
):
    """Deterministic training-shard layout: every row gets ``shard`` and,
    when ``order_within``, ``shard_pos`` (its position in the shard's
    deterministic read order). ONE md5 of (seed, id) drives both — the
    shard is the key's high hex digits mod ``n_shards``, the order is the
    key itself — so the layout is a pure, engine-portable function of
    (seed, id): any reader that can compute md5 reproduces shard
    membership and order (the same portability contract as
    ``sampling._hash_bucket``). Changing ``seed`` is a fresh epoch-level
    reshuffle with zero state.

    PRECONDITION: ``id_col`` unique and non-null (the usual doc-id
    contract) — duplicate or NULL ids collapse to one order key and their
    relative ``shard_pos`` would then depend on arrival order.

    The trainer-facing final step after packing/mixing: write with
    ``.repartition(n_shards, 'shard').write.partitionBy('shard')`` (or
    into a snapshot table) and each reader rank streams its shard in
    ``shard_pos`` order — no coordination, bit-reproducible.

    Scale: one hash projection (map-side) plus, with ``order_within``, a
    row_number window per shard — a single shuffle on the shard key, which
    the write's repartition needs anyway."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.md5(F.concat_ws("\x1f", F.lit(seed), F.col(id_col).cast("string")))
    out = df.withColumn("__k", key).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("__k"), 1, 15), 16, 10).cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    )
    if order_within:
        w = Window.partitionBy("shard").orderBy(F.col("__k"), F.col(id_col))
        out = out.withColumn("shard_pos", F.row_number().over(w).cast("long"))
    return out.drop("__k")
