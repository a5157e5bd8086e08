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

Codec story: PIL/ffmpeg are NOT installed here, so ``_decode_image``
prefers PIL when importable (real clusters) and otherwise REALLY decodes
PNG via the stdlib codec in ``multimodal.png`` (zlib inflate + filter
reconstruction) — generated-PNG payloads (``attach_generated_png``) are
decoded end-to-end, no fakes. ``_fake_features`` remains the explicit
opt-in stand-in for formats with no available codec, keeping every piece
of Spark plumbing (schemas, batch iteration, cardinality change,
partitioning) testable regardless.
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


def attach_generated_png(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
    vary_height_mod: int | None = None,
    compress_level: int = 6,
) -> DataFrame:
    """REAL media payloads, generated in-plan: each row gets a valid 8-bit
    RGB PNG (``multimodal.png.encode_png``) whose pixels derive
    deterministically from sha256 of the row id — so decode paths can be
    exercised end-to-end on actual compressed images, reproducibly, with
    no binary testdata. Runs as one Arrow-batched ``mapInPandas`` (codec
    work is per-batch Python, the 100 TB shape for any encode stage).

    ``vary_height_mod=m`` gives row ``i`` height ``height + i % m`` (a
    per-row image size); with ``compress_level=0`` the byte length is
    then the exact arithmetic ``png.encoded_png_size(width, h_i)``, which
    is what lets the metadata oracle verify REAL generated-image sizes in
    SQL."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Engine imports happen INSIDE the closure after a sys.path
        # bootstrap: a module-global reference would make cloudpickle
        # serialize by module name and executors without the package on
        # PYTHONPATH would fail to unpickle the task. On a real cluster
        # the package ships via --py-files/pip and the bootstrap is a
        # no-op; in local mode it makes the task self-contained.
        import hashlib as _hashlib
        from azure_etl_databricks_sql_powerbi_spark.multimodal.png import encode_png

        for pdf in it:
            payloads = []
            for rid in pdf[id_col]:
                seed = _hashlib.sha256(str(int(rid)).encode()).digest()
                h = height + (int(rid) % vary_height_mod if vary_height_mod else 0)
                n_px = width * h * 3
                # seed-dependent brightness ramp (not raw hash bytes: those
                # mean-pool to the same ~127.5 gray everywhere, which would
                # make every decoded embedding identical — a ramp gives each
                # image a distinct, still deterministic, feature vector)
                slope = 1 + seed[1] % 7
                pixels = bytes((seed[0] + i * slope) % 256 for i in range(n_px))
                payloads.append(encode_png(width, h, pixels, compress_level))
            yield pd.DataFrame(
                {"media_id": pdf[id_col].values, "content": payloads}
            )

    return spread(df.select(id_col)).mapInPandas(
        _task_batches(batches), "media_id bigint, content binary"
    )


# ------------------------------------------------ Arrow-batched decode path


def _package_parent() -> str:
    """Directory containing the engine package — captured driver-side so
    executor closures can bootstrap ``sys.path`` before importing engine
    modules (see ``attach_generated_png``/``decode_image_features``)."""
    import os

    import azure_etl_databricks_sql_powerbi_spark as _pkg

    return os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))


def _task_frames(body):
    """mapInPandas closure factory shared by the reader connectors:
    sys.path-bootstrap (executors unpickle by module name — the
    multimodal/ops.py pattern), then ``body(pdf)`` per batch. ``body``
    MUST be a NESTED function (cloudpickle serializes closures by
    VALUE; a module-level body would serialize by reference and fail
    to unpickle before the bootstrap runs); it imports this module's
    helpers inside itself, after the bootstrap. One definition instead
    of a copy per connector (r13 review; hosted here next to
    _package_parent — this module's own ``batches`` closures predate
    the factory and migrate opportunistically)."""
    pkg_parent = _package_parent()

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        for pdf in batches:
            yield from body(pdf)

    return parse


def _task_batches(body):
    """Bootstrap-only sibling of :func:`_task_frames` for closures that
    own the WHOLE batch iterator (per-task state: an output file, a
    per-task accumulator): same sys.path bootstrap, body keeps the
    ``(it) -> Iterator[pd.DataFrame]`` shape."""
    pkg_parent = _package_parent()

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        yield from body(batches)

    return parse


def _pool_features(flat: "object", dim: int) -> list[float]:
    """Shared featurizer tail: unit-norm ``dim``-float mean-pool of a flat
    [0,1] pixel array."""
    import numpy as np

    raw = [float(chunk.mean()) for chunk in np.array_split(flat, dim)]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return [x / norm for x in raw]


def _decode_image(data: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Real decode path: decode + 16x16 RGB thumbnail average-pooled into
    a ``dim``-float unit-norm embedding.

    Codec selection: PIL when importable (any format, bicubic thumbnail —
    the real-cluster path); otherwise the stdlib PNG codec
    (``multimodal.png``: zlib inflate + filter reconstruction, nearest-
    neighbor 16x16 sampling) — a REAL decode, not a fake, for the PNG
    payloads this engine generates. Non-PNG payloads without PIL raise
    ``NotImplementedError`` loudly; ``fake_features=True`` remains the
    explicit opt-in stand-in for codec-less formats."""
    import numpy as np

    try:
        import PIL.Image
    except ImportError:
        pass
    else:
        import io

        with PIL.Image.open(io.BytesIO(data)) as img:
            width, height = img.size
            thumb = img.convert("RGB").resize((16, 16))
            flat = np.asarray(thumb, dtype="float64").reshape(-1) / 255.0
        return width, height, _pool_features(flat, dim)

    from azure_etl_databricks_sql_powerbi_spark.multimodal.png import decode_png

    width, height, ch, pixels = decode_png(data)
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, ch)[:, :, :3]
    # nearest-neighbor 16x16 thumbnail, then the same pooling tail
    ys = (np.arange(16) * height) // 16
    xs = (np.arange(16) * width) // 16
    thumb = px[ys][:, xs].astype("float64").reshape(-1) / 255.0
    return width, height, _pool_features(thumb, dim)


def _decode_rgb(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, raw RGB bytes) through the same codec dispatch as
    ``_decode_image``: PIL when importable (any format), else the stdlib
    PNG codec — so every operator that needs a raster decodes a given
    payload identically."""
    try:
        import PIL.Image
    except ImportError:
        pass
    else:
        import io

        with PIL.Image.open(io.BytesIO(data)) as img:
            width, height = img.size
            return width, height, img.convert("RGB").tobytes()

    import numpy as np

    from azure_etl_databricks_sql_powerbi_spark.multimodal.png import decode_png

    width, height, ch, pixels = decode_png(data)
    if ch == 3:
        return width, height, pixels
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, ch)
    return width, height, px[:, :, :3].tobytes()


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
    fake_features: bool = False,
) -> DataFrame:
    """Decode + featurize via ``mapInPandas``: one Arrow batch in, one out.

    Output schema: (media_id, width, height, embedding float[]).

    The DEFAULT path is the real codec (``_decode_image``: PIL when
    importable, else the stdlib PNG codec) and fails loudly on payloads it
    cannot decode; ``fake_features=True`` is the explicit opt-in
    deterministic stand-in for codec-less formats/tests.
    """


    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bootstrap + in-closure import: see attach_generated_png
        from azure_etl_databricks_sql_powerbi_spark.multimodal.ops import (
            _decode_image,
            _fake_features,
        )

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

    return spread(df).mapInPandas(_task_batches(batches), IMAGE_FEATURES_SCHEMA)


def attach_generated_wav(
    df: DataFrame,
    id_col: str = "doc_id",
    sample_rate: int = 8000,
    n_samples: int = 1600,
) -> DataFrame:
    """REAL audio payloads, generated in-plan: each row gets a valid PCM16
    WAV (``multimodal.wav.encode_wav``) — a seed-keyed sine tone whose
    frequency/amplitude derive from sha256 of the row id, so audio decode
    runs end-to-end on actual RIFF containers, deterministically."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import math
        from azure_etl_databricks_sql_powerbi_spark.multimodal.wav import encode_wav

        for pdf in it:
            payloads = []
            for rid in pdf[id_col]:
                seed = _hashlib.sha256(str(int(rid)).encode()).digest()
                freq = 100 + seed[0] * 8  # 100..2140 Hz
                amp = 8000 + seed[1] * 64  # well inside int16
                samples = [
                    int(amp * math.sin(2 * math.pi * freq * i / sample_rate))
                    for i in range(n_samples)
                ]
                payloads.append(encode_wav(samples, sample_rate))
            yield pd.DataFrame(
                {"media_id": pdf[id_col].values, "content": payloads}
            )

    return spread(df.select(id_col)).mapInPandas(
        _task_batches(batches), "media_id bigint, content binary"
    )


def audio_features(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Real audio feature extraction over PCM16 WAV payloads
    (``multimodal.wav.decode_wav``): duration, RMS level, zero-crossing
    rate, peak amplitude, plus FFT spectral features (dominant frequency,
    spectral centroid) — the standard cheap audio QC/fingerprint set, one
    Arrow batch at a time. For the engine's generated sine tones the
    dominant frequency must land within one FFT bin of the synthesis
    frequency — the analytic cross-check the unit test asserts."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from azure_etl_databricks_sql_powerbi_spark.multimodal.wav import decode_wav

        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "sample_rate": [],
                "n_samples": [],
                "duration_sec": [],
                "rms": [],
                "zero_crossing_rate": [],
                "peak": [],
                "dominant_freq_hz": [],
                "spectral_centroid_hz": [],
            }
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                rate, ch, samples = decode_wav(bytes(data))
                # decode_wav yields interleaved samples: duration counts
                # FRAMES (n // channels), and zcr must run per channel —
                # computed on the raw interleaved stream both would be
                # wrong by a factor of `ch` for stereo input.
                x = np.asarray(samples, dtype=np.float64)
                n = len(x)
                frames = n // ch if ch else 0
                chans = x[: frames * ch].reshape(frames, ch) if frames else x.reshape(0, max(ch, 1))
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_sec"].append(round(frames / rate, 6))
                out["rms"].append(round(float(np.sqrt((x**2).mean())), 3) if n else 0.0)
                out["zero_crossing_rate"].append(
                    round(
                        float(
                            np.mean(
                                [
                                    (np.diff(np.signbit(chans[:, c])) != 0).mean()
                                    for c in range(chans.shape[1])
                                ]
                            )
                        ),
                        6,
                    )
                    if frames > 1
                    else 0.0
                )
                out["peak"].append(int(np.abs(x).max()) if n else 0)
                # spectral features over the channel-mean signal: rfft
                # magnitude spectrum; dominant bin -> Hz, centroid =
                # magnitude-weighted mean frequency (DC excluded so
                # silence/offset doesn't dominate)
                if frames > 1:
                    mono = chans.mean(axis=1)
                    power = np.abs(np.fft.rfft(mono)) ** 2
                    freqs = np.fft.rfftfreq(frames, d=1.0 / rate)
                    power[0] = 0.0  # exclude DC
                    dom = float(freqs[int(power.argmax())])
                    denom = float(power.sum())
                    # power-weighted centroid: magnitude weighting lets
                    # spectral-leakage tails drag a pure tone's centroid
                    # ~25% off its frequency; power concentrates on the peak
                    cent = float((freqs * power).sum() / denom) if denom > 0 else 0.0
                else:
                    dom, cent = 0.0, 0.0
                out["dominant_freq_hz"].append(round(dom, 3))
                out["spectral_centroid_hz"].append(round(cent, 3))
            yield pd.DataFrame(out)

    return spread(df).mapInPandas(_task_batches(batches),
        "media_id bigint, sample_rate int, n_samples long, duration_sec double, "
        "rms double, zero_crossing_rate double, peak long, "
        "dominant_freq_hz double, spectral_centroid_hz double",
    )


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

    return spread(df).mapInPandas(_task_batches(batches), FRAME_SCHEMA)


def sample_decoded_frames(
    df: DataFrame,
    n_frames: int = 4,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL frame extraction: decode each payload through the same codec
    dispatch as ``decode_image_features`` (``_decode_rgb``: PIL when
    importable, else the stdlib PNG codec) and emit ``n_frames``
    evenly-split horizontal pixel bands — frame bytes/hashes are over
    DECODED RGB rasters, not container byte slices. Same
    cardinality-changing Arrow shape as ``sample_frames`` (one row in,
    ``n_frames`` rows out); at 100 TB this is the ffmpeg
    keyframe-extraction slot with the codec swapped in per batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bootstrap + in-closure import: see attach_generated_png
        import hashlib as _hashlib
        from azure_etl_databricks_sql_powerbi_spark.multimodal.ops import _decode_rgb

        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            blobs: list[bytes] = []
            shas: list[str] = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                width, height, pixels = _decode_rgb(bytes(data))
                row_bytes = width * 3
                # clamp: a raster shorter than n_frames must not emit
                # empty trailing bands (zero-byte frames with a valid
                # sha256 of b'' read as decoded content downstream)
                k_frames = min(n_frames, height)
                step = max(1, height // k_frames)
                for i in range(k_frames):
                    lo = min(i * step, height) * row_bytes
                    hi = (height if i == k_frames - 1 else min((i + 1) * step, height)) * row_bytes
                    band = pixels[lo:hi]
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(band)
                    shas.append(_hashlib.sha256(band).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": blobs,
                    "frame_sha256": shas,
                }
            )

    return spread(df).mapInPandas(_task_batches(batches), FRAME_SCHEMA)


# ------------------------------------------------ file landing / ingestion


def land_media_files(
    df: DataFrame,
    out_dir: str,
    id_col: str = "media_id",
    content_col: str = "content",
    ext: str = "png",
) -> int:
    """Write each row's payload as an individual ``<id>.<ext>`` file under
    ``out_dir`` — the landing half of the binary-file ingestion loop
    (``sources.files.read_binary_files`` is the scan half).

    Executor-side: one ``mapInPandas`` pass writes files in parallel and
    emits one count row per batch; the driver sees only the summed count
    (never the payloads). In local mode ``out_dir`` is a local path; on a
    cluster it must be a shared filesystem (the same contract as any
    Hadoop-FS sink). Deterministic names make re-landing idempotent."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os as _os

        n = 0
        for pdf in it:
            for rid, payload in zip(pdf[id_col], pdf[content_col]):
                tmp_name = _os.path.join(out_dir, f".{int(rid)}.{ext}.tmp")
                final = _os.path.join(out_dir, f"{int(rid)}.{ext}")
                with open(tmp_name, "wb") as fh:
                    fh.write(bytes(payload))
                _os.replace(tmp_name, final)  # atomic publish, idempotent
                n += 1
        yield pd.DataFrame({"n": [n]})

    counts = df.select(id_col, content_col).mapInPandas(
        _task_batches(write_batches), "n bigint"
    )
    # bounded collect: one row per task
    return int(sum(r["n"] for r in counts.collect()))


RESIZED_SCHEMA = (
    "media_id long, width int, height int, content binary, content_sha256 string"
)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL image resize — the remaining slot in the multimodal quartet
    (decode / feature-extract / RESIZE / frame-sample): decode each
    payload through the shared codec dispatch (``_decode_rgb``: PIL when
    importable, stdlib PNG codec otherwise), nearest-neighbor resample to
    ``out_w x out_h`` with PURE integer index arithmetic
    (``src = floor(dst * src_dim / dst_dim)`` — the classic NN grid, no
    float filtering, so the result is bit-deterministic across runs,
    partitionings, and machines), and re-encode with the stdlib PNG
    writer. One Arrow ``mapInPandas`` in the scan stage, zero shuffles —
    at 100 TB this is the thumbnail/normalize pass before feature
    extraction, with the codec swapped per batch.

    Output: (media_id, width, height, content [resized PNG bytes],
    content_sha256)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bootstrap + in-closure import: see attach_generated_png
        import hashlib as _hashlib
        import numpy as np

        from azure_etl_databricks_sql_powerbi_spark.multimodal.ops import _decode_rgb
        from azure_etl_databricks_sql_powerbi_spark.multimodal.png import encode_png

        for pdf in it:
            ids, ws, hs, blobs, shas = [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                w, h, pixels = _decode_rgb(bytes(data))
                px = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
                # nearest-neighbor source index per destination pixel
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = px[ys[:, None], xs[None, :], :]
                payload = encode_png(out_w, out_h, resized.tobytes())
                ids.append(mid)
                ws.append(out_w)
                hs.append(out_h)
                blobs.append(payload)
                shas.append(_hashlib.sha256(payload).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "content": blobs,
                    "content_sha256": shas,
                }
            )

    return spread(df).mapInPandas(_task_batches(batches), RESIZED_SCHEMA)


RESAMPLED_SCHEMA = (
    "media_id long, sample_rate int, n_samples int, content binary, "
    "content_sha256 string"
)


def resample_audio(
    df: DataFrame,
    out_rate: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL audio resample — the audio twin of ``resize_images``: decode
    each PCM16 WAV through the stdlib RIFF codec, nearest-neighbor
    resample the sample grid to ``out_rate`` (``src = floor(dst *
    in_rate / out_rate)`` — pure integer index arithmetic, the image-
    resize contract, bit-deterministic everywhere; production swaps in a
    windowed-sinc per batch, same plumbing), re-encode at the new rate.
    Duration is preserved: ``n_out = floor(n_in * out_rate / in_rate)``.
    One Arrow ``mapInPandas`` in the scan stage, zero shuffles — the
    normalize-to-16kHz pass every speech pipeline runs before
    featurization."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bootstrap + in-closure import: see attach_generated_png
        import hashlib as _hashlib
        import numpy as np

        from azure_etl_databricks_sql_powerbi_spark.multimodal.wav import (
            decode_wav,
            encode_wav,
        )

        for pdf in it:
            ids, rates, ns, blobs, shas = [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                in_rate, channels, samples = decode_wav(bytes(data))
                x = np.asarray(samples, dtype=np.int64)
                n_in = len(x) // channels
                n_out = (n_in * out_rate) // in_rate
                idx = (np.arange(n_out) * in_rate) // out_rate
                if channels > 1:
                    frames = x.reshape(n_in, channels)
                    out = frames[idx].reshape(-1)
                else:
                    out = x[idx]
                payload = encode_wav(
                    [int(v) for v in out], sample_rate=out_rate, channels=channels
                )
                ids.append(mid)
                rates.append(out_rate)
                ns.append(int(n_out))
                blobs.append(payload)
                shas.append(_hashlib.sha256(payload).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "sample_rate": rates,
                    "n_samples": ns,
                    "content": blobs,
                    "content_sha256": shas,
                }
            )

    return spread(df).mapInPandas(_task_batches(batches), RESAMPLED_SCHEMA)


AUDIO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, start_sample long, n_samples int, "
    "frame_sha256 string, rms double"
)


def audio_frames(
    df: DataFrame,
    frame_len: int = 400,
    hop: int = 160,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Fixed-length overlapping audio frames — the STFT/feature framing
    step (the audio twin of ``sample_decoded_frames``): decode PCM16
    through the stdlib RIFF codec, slice the (channel-averaged) signal
    into ``frame_len``-sample windows every ``hop`` samples (25ms/10ms at
    16kHz with the defaults), and emit one row per frame with its exact
    placement, content hash, and RMS energy — the row layout a
    downstream featurizer (MFCC, spectrogram pandas UDF) consumes.
    Cardinality-changing Arrow ``mapInPandas`` in the scan stage, zero
    shuffles; frames count = 1 + floor((n - frame_len)/hop) for
    n >= frame_len, else one zero-padded frame (padding flagged by
    n_samples < frame_len)."""
    if frame_len <= 0 or hop <= 0:
        raise ValueError("frame_len and hop must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bootstrap + in-closure import: see attach_generated_png
        import hashlib as _hashlib
        import numpy as np

        from azure_etl_databricks_sql_powerbi_spark.multimodal.wav import decode_wav

        for pdf in it:
            ids, idxs, starts, ns, shas, rmss = [], [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                _rate, channels, samples = decode_wav(bytes(data))
                x = np.asarray(samples, dtype=np.float64)
                if channels > 1:
                    x = x.reshape(-1, channels).mean(axis=1)
                n = len(x)
                n_frames = 1 + max(0, (n - frame_len)) // hop if n else 0
                for i in range(max(n_frames, 1 if n else 0)):
                    lo = i * hop
                    seg = x[lo : lo + frame_len]
                    n_seg = len(seg)
                    if n_seg < frame_len:
                        seg = np.pad(seg, (0, frame_len - n_seg))
                    ids.append(mid)
                    idxs.append(i)
                    starts.append(lo)
                    ns.append(int(n_seg))
                    shas.append(
                        _hashlib.sha256(seg.astype("<f8").tobytes()).hexdigest()
                    )
                    rmss.append(float(np.sqrt(np.mean(seg * seg))))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "start_sample": starts,
                    "n_samples": ns,
                    "frame_sha256": shas,
                    "rms": rmss,
                }
            )

    return spread(df).mapInPandas(_task_batches(batches), AUDIO_FRAME_SCHEMA)
