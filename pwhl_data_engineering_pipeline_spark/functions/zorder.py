"""Z-order (Morton) interleaving for multi-column data skipping.

Sorting a table by (a, b) clusters ``a`` perfectly and ``b`` not at all; a
z-order curve interleaves the bits of both, so parquet row-group min/max
stats become selective for point/range filters on EITHER column — the same
layout idea as Delta's OPTIMIZE ZORDER, expressed as plain Spark expressions
plus repartitionByRange. At 100 TB this is the difference between a filter
on the second clustering column scanning every row group and scanning a few
percent.

All pure JVM expressions (shift/or loops unrolled at plan-build time, inside
whole-stage codegen); one tiny extra driver job computes per-column min/max
for quantization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, cmin: float, cmax: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) rank space via min-max scaling
    (NULLs → 0: they cluster together at the curve origin)."""
    span = (cmax - cmin) or 1.0
    q = F.floor((col.cast("double") - F.lit(cmin)) / F.lit(span) * F.lit((1 << bits) - 1))
    # coalesce BEFORE clamping: least/greatest skip NULL inputs, so a NULL q
    # would otherwise slide to the curve end (2^bits - 1), not the origin
    q = F.coalesce(q, F.lit(0))
    return F.greatest(F.lit(0), F.least(q, F.lit((1 << bits) - 1))).cast("long")


def interleave_bits(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave: bit i of column j lands at position
    i*len(cols)+j of the key. Unrolled to a flat OR tree (bits×cols terms)
    so it stays inside codegen — no UDF, no loop at runtime."""
    n = len(cols)
    if bits * n > 63:
        # JVM shiftleft masks the shift amount mod 64: position 64 wraps to
        # 0 and different columns' bits silently collide. Refuse instead.
        raise ValueError(
            f"bits*len(cols) = {bits * n} exceeds 63 — use bits <= {63 // n} "
            f"for {n} columns (zorder_key auto-shrinks)"
        )
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftrightunsigned(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def zorder_key(
    df: DataFrame, zcols: Sequence[str], bits: int = 16
) -> Column:
    """Z-order key expression for ``df``'s columns. Runs one small agg job to
    learn per-column min/max for quantization (at scale: compute once per
    table, or use known domain bounds). ``bits`` auto-shrinks so the
    interleaved key fits in 63 bits regardless of column count."""
    bits = min(bits, 63 // max(len(zcols), 1))
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__min_{c}") for c in zcols],
        *[F.max(F.col(c).cast("double")).alias(f"__max_{c}") for c in zcols],
    ).collect()[0]
    quantized = [
        quantize(
            F.col(c),
            stats[f"__min_{c}"] if stats[f"__min_{c}"] is not None else 0.0,
            stats[f"__max_{c}"] if stats[f"__max_{c}"] is not None else 1.0,
            bits,
        )
        for c in zcols
    ]
    return interleave_bits(quantized, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: Sequence[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the z-curve of ``zcols``:
    range-partition on the z-key (even file sizes) and sort within each file
    (row-group min/max stats become tight on every z column). Readers prune
    with ordinary filters — no special read path needed."""
    key = zorder_key(df, zcols, bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
