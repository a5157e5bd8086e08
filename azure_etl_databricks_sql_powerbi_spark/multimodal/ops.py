"""Multimodal operators: metadata extraction (JVM-side), decode /
featurize / frame-sample (Arrow-batched ``mapInPandas``).

Split of responsibilities, which is the 100 TB design point:

- Anything computable from raw bytes with built-in functions stays a
  Catalyst expression (``media_metadata``): byte length, content hash,
  magic-number type sniff — scan-speed, prunable, oracle-checkable.
- Anything needing a codec goes through ``mapInPandas``: executors stream
  Arrow record batches into pandas, the UDF is called once per BATCH (not
  per row), and output can change cardinality (frame sampling explodes one
  video row into N frame rows). Batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of large
  blobs fits executor memory.

The actual image/audio codecs (PIL/ffmpeg/...) are NOT in this
environment: ``_decode_image`` runs a real PIL decode+featurize where PIL
is importable and raises ``NotImplementedError`` otherwise; the
deterministic fallback featurizer derives pseudo-features from a content
hash — making every piece of Spark plumbing (schemas, batch iteration,
cardinality change, partitioning) real and testable without codecs.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.multimodal.schema import (
    FRAME_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
)
from azure_etl_databricks_sql_powerbi_spark.util import spread

# -------------------------------------------------- JVM-side metadata path

_MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "riff",  # wav/avi container
    "00000018": "video/mp4",
    "00000020": "video/mp4",
}


def sniff_media_type(content: Column | str) -> Column:
    """Magic-number media-type sniff on the first bytes — a CASE chain over
    ``hex(substring(bytes))``, no decode, no Python."""
    c = F.col(content) if isinstance(content, str) else content
    head8 = F.lower(F.hex(F.substring(c, 1, 4)))
    head6 = F.substring(head8, 1, 6)
    expr = F.lit("application/octet-stream")
    for magic, mtype in sorted(_MAGIC.items(), reverse=True):
        probe = head6 if len(magic) == 6 else head8
        expr = F.when(probe == magic, F.lit(mtype)).otherwise(expr)
    return expr


def media_metadata(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """(id, media_type, n_bytes, sha256): the prunable metadata columns a
    multimodal table carries alongside its opaque payload."""
    return df.select(
        F.col(id_col),
        sniff_media_type(content_col).alias("media_type"),
        F.octet_length(F.col(content_col)).cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.col(content_col), 256)).alias("sha256"),
    )


def attach_fake_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic stand-in media: utf-8 bytes of the text column behind
    a tiny PNG-like header. Lets every multimodal operator run and be
    verified in an environment with no codecs and no binary testdata."""
    payload = F.concat(
        F.to_binary(F.lit("89504e470d0a1a0a"), F.lit("hex")),
        F.encode(F.col(text_col), "utf-8"),
    )
    return df.select(F.col(id_col).alias("media_id"), payload.alias("content"))


# ------------------------------------------------ Arrow-batched decode path


def _decode_image(data: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Real decode path: PIL decode + 16x16 RGB thumbnail average-pooled
    into a ``dim``-float unit-norm embedding. Raises NotImplementedError
    where no codec is importable (this sandbox) — callers use
    ``fake_features=True`` there; the Spark plumbing is identical either
    way, so the fallback exercises everything but libjpeg/libpng."""
    try:
        import PIL.Image
    except ImportError as exc:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use fake_features=True for the deterministic fallback"
        ) from exc
    import io

    import numpy as np

    with PIL.Image.open(io.BytesIO(data)) as img:
        width, height = img.size
        thumb = img.convert("RGB").resize((16, 16))
        flat = np.asarray(thumb, dtype="float64").reshape(-1) / 255.0
    raw = [float(chunk.mean()) for chunk in np.array_split(flat, dim)]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return width, height, [x / norm for x in raw]


def _fake_features(data: bytes, dim: int) -> tuple[int, int, list[float]]:
    """Deterministic pseudo-decode: width/height and a unit-norm embedding
    derived from the sha256 of the payload."""
    digest = hashlib.sha256(data or b"").digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    raw = [
        struct.unpack_from(">i", hashlib.sha256(digest + bytes([i])).digest())[0]
        for i in range(dim)
    ]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return width, height, [x / norm for x in raw]


def decode_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    dim: int = 8,
    fake_features: bool = True,
) -> DataFrame:
    """Decode + featurize via ``mapInPandas``: one Arrow batch in, one out.

    Output schema: (media_id, width, height, embedding float[]).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _fake_features(b, dim) if fake_features else _decode_image(b, dim)
                for b in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "embedding": [d[2] for d in decoded],
                }
            )

    return spread(df).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling with a cardinality change: each "video" row yields
    ``n_frames`` evenly-spaced byte slices (the stand-in for ffmpeg
    keyframe extraction) — one input batch maps to an n×-larger output
    batch, the exact shape a real frame sampler has."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            blobs: list[bytes] = []
            shas: list[str] = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                data = data or b""
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step]
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(chunk)
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": blobs,
                    "frame_sha256": shas,
                }
            )

    return spread(df).mapInPandas(batches, FRAME_SCHEMA)
