"""Mergeable-sketch operators — the pre-aggregation architecture that makes
distinct counts and frequency queries cheap at 100 TB.

The pattern: sketch once per fine grain (e.g. per day/partition), persist the
tiny binary sketches, and answer coarser-grain questions by MERGING sketches
instead of rescanning raw data. All sketch aggregates are algebraic
(partial-combinable), so they map-side combine and shuffle bytes, not rows.

Built on Spark's native sketch functions (Apache DataSketches HLL via
``hll_sketch_agg``/``hll_union_agg``, and ``count_min_sketch``) — no UDFs,
fully codegen/partial-agg friendly. The reference has no sketches (its scale
never needs them); this is north-star surface for corpus analytics: rolling
distinct users/documents, vocabulary size, heavy-hitter tokens.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-key HLL sketches of ``value_col``: (keys..., hll binary, n_rows).

    Persist this at the finest grain you query (day, source, shard); the
    sketch is ~2^lgk bytes regardless of cardinality (lgk=12 → ~1.6% rel.
    error). Exact distinct at 100 TB shuffles every distinct value; this
    shuffles ≤ groups × 4 KB."""
    return df.groupBy(*keys).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lgk})").alias("hll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_estimate(sketch_df: DataFrame, keys: Sequence[str] = ()) -> DataFrame:
    """Merge sketches up to ``keys`` grain (empty = global) and estimate
    distinct counts: (keys..., approx_distinct, n_rows).

    Sketch union is order-independent; rolling up persisted daily sketches
    estimates within the sketch's error of sketching the raw union (the
    DataSketches union gadget may hold a different HLL target type than the
    direct sketch, so the two estimates can differ by a register's worth —
    they are NOT bit-identical; the tests pin the tolerance)."""
    agg = [
        F.expr("hll_sketch_estimate(hll_union_agg(hll))").alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    ]
    return sketch_df.groupBy(*keys).agg(*agg) if keys else sketch_df.agg(*agg)


def cms_build(
    df: DataFrame,
    value_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Build a count-min sketch of ``value_col`` and return its serialized
    bytes (driver-side: the sketch is KBs; the build is a single algebraic
    aggregation over the data). Query with :func:`cms_estimate`."""
    row = df.agg(
        F.expr(
            f"count_min_sketch({value_col}, {eps}d, {confidence}d, {seed})"
        ).alias("cms")
    ).collect()[0]
    return bytes(row["cms"])


def cms_estimate(spark, sketch: bytes, items: Sequence) -> dict:
    """Estimate the frequency of ``items`` from a serialized count-min sketch
    (driver-side probe via Spark's own CountMinSketch implementation).
    Estimates are upper bounds: true_count <= est <= true_count + eps*N with
    the sketch's confidence."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(sketch))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return {it: cms.estimateCount(it) for it in items}


def token_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    eps: float = 0.0005,
) -> tuple[bytes, DataFrame]:
    """Corpus heavy-hitter tokens, sketch-assisted: returns (cms bytes, the
    exact top-k token table). The CMS answers ad-hoc "how often does token X
    appear" probes without rescanning; the exact top-k (explode + count +
    TakeOrderedAndProject) is the ground truth the sketch is validated
    against in tests."""
    from ..functions.text import tokens

    tok = docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
    cms = cms_build(tok, "token", eps=eps)
    topk = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )
    return cms, topk
