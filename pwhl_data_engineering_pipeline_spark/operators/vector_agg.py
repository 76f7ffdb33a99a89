"""Grouped vector aggregation over embedding columns (north-star surface):
per-group centroids — the primitive behind k-means-style clustering stats,
per-source embedding drift monitoring, and class prototypes for
nearest-centroid labeling of training data.

Two implementations with identical semantics:

- :func:`vector_mean_long` — posexplode to (group, dim, value) rows and
  aggregate with exact integer-scaled sums. Fully SQL-expressible (DuckDB
  oracle) and deterministic to the bit across engines, but the explode
  multiplies rows × dim before the shuffle: at 100 TB × 128 dims that is a
  128× shuffle blow-up.
- :func:`vector_mean_arrow` — the scale path: numpy column-stack mean per
  Arrow batch inside ``applyInPandas`` partial aggregation; only
  (group, sum_vector, count) partials cross the wire, so shuffle volume is
  ≤ partitions × groups rows regardless of corpus size (the same
  pre-reduction shape as similarity.brute_force_topk_arrow).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import portable_round


def vector_mean_long(
    df: DataFrame,
    group_cols: Sequence[str],
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Per-group, per-dimension mean as long-format rows
    (group..., dim [1-based], mean_v, n_vectors).

    Exactness: each element is scaled to an integer with
    ``floor(v * 10^d + 0.5)`` before summing, so partial-aggregation order
    cannot move the result and a DuckDB oracle matches bit-for-bit; the mean
    is one double division at the end (see scalars.portable_round).
    """
    scale = float(10**decimals)
    ex = df.select(
        *group_cols, F.posexplode(F.col(vec_col).cast("array<double>")).alias("__p", "__v")
    )
    n = F.count(F.lit(1))
    return (
        ex.groupBy(*group_cols, (F.col("__p") + 1).alias("dim"))
        .agg(
            portable_round(
                F.sum(F.floor(F.col("__v") * scale + F.lit(0.5))) / F.lit(scale) / n,
                decimals,
            ).alias("mean_v"),
            n.alias("n_vectors"),
        )
    )


def vector_mean_arrow(
    df: DataFrame,
    group_cols: Sequence[str],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid as an array column: (group..., centroid, n_vectors).

    ``applyInPandas`` receives each group's rows and reduces them with one
    numpy mean — at cluster scale Spark performs the grouping shuffle on the
    raw vectors; for very wide groups prefer a two-stage partial-mean (sum +
    count per partition, combine) which this function's long-format sibling
    already demonstrates expression-level."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    gfields = [df.schema[c] for c in group_cols]
    out_schema = T.StructType(
        [*gfields,
         T.StructField("centroid", T.ArrayType(T.DoubleType())),
         T.StructField("n_vectors", T.LongType())]
    )

    def mean_group(pdf):
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row["centroid"] = [mat.mean(axis=0).tolist()]
        row["n_vectors"] = [len(pdf)]
        return pd.DataFrame(row)

    return df.select(*group_cols, vec_col).groupBy(*group_cols).applyInPandas(
        mean_group, out_schema
    )
