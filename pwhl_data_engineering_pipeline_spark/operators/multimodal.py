"""Multimodal column plumbing (north-star surface).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery — schemas, batch-shaped Arrow UDFs over
``mapInPandas``, partitioning by media size — is real and tested; the actual
codec work is stubbed (decode libs are not in this container) behind
deterministic fakes / NotImplementedError, clearly marked.

Scale notes: media rows are orders of magnitude wider than text rows, so
(1) metadata lives in its own narrow struct column → metadata-only queries
never touch bytes (Parquet column pruning), and (2) ``mapInPandas`` batches
are capped by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low
(e.g. 64) for media tables so an Arrow batch of blobs fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),        # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_meta(df: DataFrame, content_col: str = "content", media_type: str = "image", fmt: str = "bin") -> DataFrame:
    """Derive the typed metadata struct from a binary column (size is real;
    codec-derived fields are left NULL until a real decoder fills them)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(F.col(content_col)).cast("bigint").alias("size_bytes"),
        ),
    )


def _fake_decode_features(blob: bytes, dim: int) -> list[float]:
    """Deterministic fake feature extractor (STUB — container has no codec
    libs). Hashes the bytes into a stable pseudo-feature vector so the Spark
    plumbing (batching, schema, joins downstream) is fully exercisable.
    Replace with a real decode (PIL/librosa/ffmpeg) in production."""
    import hashlib

    h = hashlib.sha256(blob or b"").digest()
    return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]


def extract_features(
    df: DataFrame,
    dim: int = 16,
    content_col: str = "content",
    id_col: str = "media_id",
    real_decoder=None,
) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched mapInPandas.

    ``real_decoder(blob: bytes) -> list[float]`` plugs a real codec in; the
    default deterministic fake keeps tests hermetic. Raises
    NotImplementedError if ``real_decoder == "require"`` to mark the
    production boundary explicitly.
    """
    if real_decoder == "require":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this container; pass real_decoder=callable"
        )
    decoder = real_decoder or (lambda blob: _fake_decode_features(blob, dim))

    import pandas as pd  # noqa: PLC0415

    def run(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "features": [decoder(b) for b in pdf[content_col]],
                }
            )

    narrow = df.select(F.col(id_col), F.col(content_col))
    return narrow.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to decode
    from metadata only (no bytes touched — column pruning keeps this scan
    narrow). The decode itself is the stubbed boundary above."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
