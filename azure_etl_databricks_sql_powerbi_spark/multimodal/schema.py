"""Typed schemas for multimodal (image/audio/video) columns.

Media content is an opaque ``binary`` column plus a typed metadata struct —
the Spark-native layout for 100 TB multimodal corpora: parquet stores the
bytes inline (or a URI for externalized blobs), metadata columns stay
prunable/filterable without touching the payload, and every decode-ish
operation moves Arrow record batches through Pandas UDFs, never Python
pickling per row.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# One media asset row. `content` may be NULL when `uri` points at external
# storage (the common shape once assets exceed a few MB).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("media_type", StringType(), nullable=True),  # image/audio/video
        StructField("content", BinaryType(), nullable=True),
        StructField("uri", StringType(), nullable=True),
        StructField("n_bytes", LongType(), nullable=True),
        StructField("sha256", StringType(), nullable=True),
    ]
)

# decode_image_features / featurize output
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("width", IntegerType(), nullable=True),
        StructField("height", IntegerType(), nullable=True),
        StructField("embedding", ArrayType(FloatType()), nullable=True),
    ]
)

# sample_frames output: one row per sampled frame
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("frame_idx", IntegerType(), nullable=False),
        StructField("frame_bytes", BinaryType(), nullable=True),
        StructField("frame_sha256", StringType(), nullable=True),
    ]
)
