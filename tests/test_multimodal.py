"""Multimodal plumbing: metadata expressions, Arrow-batched decode path,
frame-sampling cardinality, stubbed codec behavior."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.multimodal import ops
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF, "documents").limit(200)
    return ops.attach_fake_media(docs).cache()


def test_media_metadata_jvm_side(spark, media):
    meta = ops.media_metadata(media)
    rows = {r["media_id"]: r for r in meta.collect()}
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert set(rows) == set(raw)
    for mid, r in rows.items():
        assert r["media_type"] == "image/png"  # fake header is PNG magic
        assert r["n_bytes"] == len(raw[mid])
        assert r["sha256"] == hashlib.sha256(raw[mid]).hexdigest()


def test_sniff_handles_unknown_bytes(spark):
    df = spark.createDataFrame(
        [(1, b"\x00\x01\x02\x03"), (2, b"\xff\xd8\xff\xe0rest"), (3, None)],
        "media_id long, content binary",
    )
    got = {
        r["media_id"]: r["media_type"]
        for r in df.select("media_id", ops.sniff_media_type("content").alias("media_type")).collect()
    }
    assert got[1] == "application/octet-stream"
    assert got[2] == "image/jpeg"
    assert got[3] == "application/octet-stream"  # null content -> default


def test_decode_features_deterministic(spark, media):
    # fake_features is an EXPLICIT opt-in (the default is the real codec,
    # which would loudly reject these pseudo-PNG payloads)
    feats = ops.decode_image_features(media, dim=8, fake_features=True)
    assert feats.schema == ops.IMAGE_FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
        assert len(r["embedding"]) == 8
        norm = sum(x * x for x in r["embedding"]) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-3)
    # deterministic across runs
    again = {
        r["media_id"]: r["embedding"]
        for r in ops.decode_image_features(media, dim=8, fake_features=True).collect()
    }
    assert {r["media_id"]: r["embedding"] for r in rows} == again


def test_decode_features_default_is_real_codec(spark):
    """The DEFAULT decode path really decodes: generated 16x16 PNGs come
    back with codec-reported dimensions (not sha-derived fakes), and fake
    payloads are rejected loudly under the defaults."""
    docs = load_table(spark, SF, "documents").limit(8)
    media = ops.attach_generated_png(docs, width=16, height=16)
    rows = ops.decode_image_features(media).collect()
    assert len(rows) == 8
    for r in rows:
        assert (r["width"], r["height"]) == (16, 16)
        norm = sum(x * x for x in r["embedding"]) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-3)
    fake = ops.attach_fake_media(docs.limit(1))
    with pytest.raises(Exception):  # NotImplementedError inside the UDF
        ops.decode_image_features(fake).collect()


def test_decode_rejects_garbage_loudly():
    # truncated signature and non-PNG payloads both fail loudly, never
    # silently fall back to fake features
    with pytest.raises(NotImplementedError):
        ops._decode_image(b"\x89PNG....")
    with pytest.raises(NotImplementedError):
        ops._decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_sample_frames_cardinality(spark, media):
    n = media.count()
    frames = ops.sample_frames(media, n_frames=4)
    assert frames.schema == ops.FRAME_SCHEMA
    assert frames.count() == 4 * n
    per = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.count_distinct("frame_idx").alias("d"),
    )
    bad = per.filter((F.col("k") != 4) | (F.col("d") != 4)).count()
    assert bad == 0
    # frames reassemble a prefix of the source (slices are contiguous)
    one = media.orderBy("media_id").limit(1).collect()[0]
    fr = (
        frames.filter(F.col("media_id") == one["media_id"])
        .orderBy("frame_idx")
        .collect()
    )
    joined = b"".join(bytes(r["frame_bytes"]) for r in fr)
    assert bytes(one["content"]).startswith(joined)


def test_sample_decoded_frames_real_pixels(spark):
    """Decoded-frame sampling: every frame hash is over real decoded RGB
    raster bytes, the bands reassemble the full raster exactly, and the
    extraction is deterministic across runs."""
    import hashlib as _hashlib

    from azure_etl_databricks_sql_powerbi_spark.multimodal.png import decode_png

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    media = ops.attach_generated_png(docs, width=16, height=16)
    frames = ops.sample_decoded_frames(media, n_frames=4)
    assert frames.schema == ops.FRAME_SCHEMA
    assert frames.count() == 40
    # bands of media_id 3 reassemble exactly the reference decode
    payload = bytes(media.filter(F.col("media_id") == 3).collect()[0]["content"])
    w, h, ch, pixels = decode_png(payload)
    fr = frames.filter(F.col("media_id") == 3).orderBy("frame_idx").collect()
    joined = b"".join(bytes(r["frame_bytes"]) for r in fr)
    assert joined == pixels
    for r in fr:
        assert r["frame_sha256"] == _hashlib.sha256(bytes(r["frame_bytes"])).hexdigest()
    # deterministic across runs
    again = {(r["media_id"], r["frame_idx"]): r["frame_sha256"] for r in frames.collect()}
    assert {(r["media_id"], r["frame_idx"]): r["frame_sha256"]
            for r in frames.collect()} == again


def test_audio_features_stereo_channels(spark):
    """ADVICE fix: stereo WAVs report FRAME-based duration (not 2x) and
    per-channel zcr. A stereo file interleaving two identical mono tracks
    must match the mono file's duration and zcr exactly."""
    from azure_etl_databricks_sql_powerbi_spark.multimodal.wav import encode_wav

    import math

    rate, n = 8000, 800
    mono = [int(12000 * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)]
    stereo = [s for s in mono for _ in (0, 1)]  # L=R interleaved
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(mono, rate))),
            (2, bytearray(encode_wav(stereo, rate, channels=2))),
        ],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in ops.audio_features(df).collect()}
    assert rows[1]["duration_sec"] == pytest.approx(n / rate, abs=1e-9)
    assert rows[2]["duration_sec"] == pytest.approx(n / rate, abs=1e-9)
    assert rows[2]["zero_crossing_rate"] == pytest.approx(
        rows[1]["zero_crossing_rate"], abs=1e-9
    )
    assert rows[2]["rms"] == pytest.approx(rows[1]["rms"], abs=1e-6)


def test_png_codec_roundtrip_and_filters():
    """The stdlib PNG codec really decodes: encoder->decoder roundtrip,
    plus hand-filtered scanlines for every PNG filter type (1-4) decode
    back to the original pixels."""
    import struct
    import zlib

    from azure_etl_databricks_sql_powerbi_spark.multimodal import png

    w, h = 5, 4
    rgb = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
    assert png.decode_png(png.encode_png(w, h, rgb)) == (w, h, 3, rgb)

    def filt(f, line, prev, ch=3):
        out = bytearray()
        for i in range(len(line)):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((line[i] - pred) & 0xFF)
        return out

    stride = w * 3
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        f = y % 5  # exercise filters 0,1,2,3 then 4
        line = rgb[y * stride : (y + 1) * stride]
        raw.append(f)
        raw += filt(f, line, prev)
        prev = bytearray(line)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + png._chunk(b"IEND", b"")
    )
    assert png.decode_png(data) == (w, h, 3, rgb)


def test_generated_png_real_decode_end_to_end(spark):
    """Directive-#6 path: in-plan generated REAL PNGs decoded through the
    real codec (fake_features=False) — correct dims, unit-norm embeddings,
    deterministic, and matching a driver-side reference decode."""
    from azure_etl_databricks_sql_powerbi_spark.multimodal.ops import (
        _decode_image,
        attach_generated_png,
        decode_image_features,
    )

    docs = spark.range(20).withColumnRenamed("id", "doc_id")
    media = attach_generated_png(docs, width=16, height=16)
    feats = decode_image_features(media, fake_features=False)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 20
    for r in rows.values():
        assert (r.width, r.height) == (16, 16)
        assert sum(x * x for x in r.embedding) == pytest.approx(1.0, abs=1e-6)
    # deterministic across runs
    again = {r.media_id: r.embedding for r in decode_image_features(media, fake_features=False).collect()}
    assert {m: r.embedding for m, r in rows.items()} == again
    # spark-side decode == driver-side reference decode of the same payload
    payload = bytes(media.filter(F.col("media_id") == 7).collect()[0].content)
    ref_w, ref_h, ref_emb = _decode_image(payload)
    assert (ref_w, ref_h) == (16, 16)
    assert rows[7].embedding == pytest.approx(ref_emb, abs=1e-6)


def test_decode_image_real_pil(spark):
    """Where PIL exists, fake_features=False decodes real images: correct
    width/height and a unit-norm dim-8 embedding (skipped in codec-less
    environments)."""
    import pytest

    PIL = pytest.importorskip("PIL")
    import io

    import PIL.Image

    from azure_etl_databricks_sql_powerbi_spark.multimodal.ops import decode_image_features

    buf = io.BytesIO()
    PIL.Image.new("RGB", (20, 10), color=(255, 0, 0)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "media_id long, content binary")
    row = decode_image_features(df, fake_features=False).collect()[0]
    assert (row.width, row.height) == (20, 10)
    assert abs(sum(x * x for x in row.embedding) - 1.0) < 1e-9


def test_wav_codec_roundtrip_and_guards():
    """PCM16 WAV roundtrip through the stdlib codec, word-aligned chunk
    walking, and loud rejection of non-PCM variants."""
    import struct

    from azure_etl_databricks_sql_powerbi_spark.multimodal import wav

    samples = [0, 1000, -1000, 32767, -32768, 5]
    data = wav.encode_wav(samples, sample_rate=8000, channels=1)
    assert wav.decode_wav(data) == (8000, 1, samples)

    with pytest.raises(NotImplementedError):
        wav.decode_wav(b"OggS not a riff")
    # float PCM (format 3) rejected
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    with pytest.raises(NotImplementedError, match="PCM16"):
        wav.decode_wav(bad)


def test_audio_features_end_to_end(spark):
    """Generated WAV tones decoded through the real codec: duration is
    n/rate exactly, zero-crossing rate matches the tone frequency
    analytically (zcr ~ 2f/rate), deterministic across runs."""
    import hashlib

    from azure_etl_databricks_sql_powerbi_spark.multimodal.ops import (
        attach_generated_wav,
        audio_features,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    media = attach_generated_wav(docs, sample_rate=8000, n_samples=1600)
    rows = {r.media_id: r for r in audio_features(media).collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        assert (r.sample_rate, r.n_samples) == (8000, 1600)
        assert r.duration_sec == pytest.approx(0.2)
        seed = hashlib.sha256(str(mid).encode()).digest()
        freq = 100 + seed[0] * 8
        assert r.zero_crossing_rate == pytest.approx(2 * freq / 8000, rel=0.06)
        amp = 8000 + seed[1] * 64
        # sine RMS = amp/sqrt(2); int truncation keeps it within ~1%
        assert r.rms == pytest.approx(amp / 2**0.5, rel=0.02)
        assert 0 < r.peak <= amp
        # FFT dominant frequency within one bin (rate/n = 5 Hz) of the
        # synthesis frequency — the spectral path really measures the tone
        bin_hz = 8000 / 1600
        assert abs(r.dominant_freq_hz - freq) <= bin_hz + 1e-9
        # a pure tone's power-weighted centroid sits on the tone
        assert r.spectral_centroid_hz == pytest.approx(freq, rel=0.05)
    again = {r.media_id: r for r in audio_features(media).collect()}
    assert {m: tuple(r) for m, r in rows.items()} == {m: tuple(r) for m, r in again.items()}


def test_encoded_png_size_formula():
    """encoded_png_size is exact for stored-deflate PNGs — the arithmetic
    the media_metadata oracle relies on — across sizes incl. multi-block."""
    from azure_etl_databricks_sql_powerbi_spark.multimodal.png import (
        encode_png,
        encoded_png_size,
    )

    for w, h in [(1, 1), (16, 8), (16, 16), (16, 17), (300, 80)]:
        rgb = bytes(i % 256 for i in range(w * h * 3))
        assert len(encode_png(w, h, rgb, compress_level=0)) == encoded_png_size(w, h)
    # 300x80 raw = 80*901 = 72080 > 65535 -> exercises the 2-block branch
    assert 80 * (1 + 3 * 300) > 65535


def test_sample_decoded_frames_clamps_short_rasters(spark):
    """ADVICE r5: height < n_frames must yield height bands, not empty
    trailing frames hashing b''."""
    import hashlib as _hl

    from azure_etl_databricks_sql_powerbi_spark.multimodal import ops

    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    media = ops.attach_generated_png(docs, width=4, height=2)
    out = ops.sample_decoded_frames(media, n_frames=5).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    empty_sha = _hl.sha256(b"").hexdigest()
    for mid, rs in by_id.items():
        assert len(rs) == 2  # clamped to height
        for r in rs:
            assert len(r.frame_bytes) > 0
            assert r.frame_sha256 != empty_sha


def test_binary_file_landing_roundtrip(spark, tmp_path):
    """land_media_files -> binaryFile scan roundtrip: every payload comes
    back byte-identical (content join on id), the glob filter prunes
    foreign files, and re-landing is idempotent (atomic replace)."""
    from azure_etl_databricks_sql_powerbi_spark.multimodal import ops
    from azure_etl_databricks_sql_powerbi_spark.sources.files import read_binary_files

    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    media = ops.attach_generated_png(docs, width=4, height=3, compress_level=0)
    out = str(tmp_path / "land")
    assert ops.land_media_files(media, out) == 8
    (tmp_path / "land" / "stray.txt").write_text("not a png")

    bf = read_binary_files(spark, out, glob="*.png")
    assert bf.count() == 8  # stray.txt pruned at listing time

    import pyspark.sql.functions as F

    got = bf.select(
        F.regexp_extract("path", r"(\d+)\.png$", 1).cast("bigint").alias("media_id"),
        "content",
        "length",
    )
    joined = got.join(media, on="media_id")
    rows = joined.collect()
    assert len(rows) == 8
    for r in rows:
        assert bytes(r["content"]) == bytes(r[media.columns[1]])
        assert r["length"] == len(bytes(r["content"]))

    # idempotent re-land: same names, same bytes, same count
    assert ops.land_media_files(media, out) == 8
    assert read_binary_files(spark, out, glob="*.png").count() == 8


def test_resize_images_nearest_neighbor_exact(spark):
    """resize_images: downscaling a generated raster picks EXACTLY the
    nearest-neighbor source pixels (src = dst*src_dim // dst_dim), the
    output decodes to the requested dims through the same codec, and the
    operation is deterministic across repartitionings."""
    import numpy as np

    from azure_etl_databricks_sql_powerbi_spark.multimodal import ops
    from azure_etl_databricks_sql_powerbi_spark.multimodal.png import (
        decode_png,
        encode_png,
    )

    # 4x4 raster with a distinct color per pixel (r = y*16, g = x*16)
    w, h = 4, 4
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = (y * 16, x * 16, 7)
    payload = encode_png(w, h, px.tobytes())
    df = spark.createDataFrame([(1, payload)], "media_id long, content binary")

    out = ops.resize_images(df, out_w=2, out_h=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (2, 2)
    rw, rh, ch, rpx = decode_png(bytes(r.content))
    assert (rw, rh, ch) == (2, 2, 3)
    got = np.frombuffer(rpx, dtype=np.uint8).reshape(2, 2, 3)
    # NN source indices for dst 0,1 of dim 2 from dim 4: (0*4)//2=0, (1*4)//2=2
    expected = px[[0, 2]][:, [0, 2], :]
    assert np.array_equal(got, expected)

    # upscale roundtrip: every output pixel replicates a source pixel
    up = ops.resize_images(df, out_w=8, out_h=8).collect()[0]
    uw, uh, _c, upx = decode_png(bytes(up.content))
    assert (uw, uh) == (8, 8)
    u = np.frombuffer(upx, dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(u[0, 0], px[0, 0]) and np.array_equal(u[7, 7], px[3, 3])

    # determinism across partitionings
    df4 = spark.createDataFrame(
        [(i, payload) for i in range(6)], "media_id long, content binary"
    ).repartition(5)
    a = {r.media_id: r.content_sha256 for r in ops.resize_images(df4, 2, 2).collect()}
    b = {r.media_id: r.content_sha256 for r in ops.resize_images(df4.repartition(2), 2, 2).collect()}
    assert a == b and len(set(a.values())) == 1


def test_resample_audio_preserves_duration_and_tone(spark):
    """resample_audio: 2x downsample halves the sample count (duration
    preserved at the new rate), picks exactly the even-index samples
    (NN with in_rate/out_rate = 2), roundtrips through the codec, and a
    resampled pure tone still features at the same frequency."""
    import math

    from azure_etl_databricks_sql_powerbi_spark.multimodal import ops
    from azure_etl_databricks_sql_powerbi_spark.multimodal.wav import (
        decode_wav,
        encode_wav,
    )

    rate_in, n = 8000, 1600
    tone = [
        int(8000 * math.sin(2 * math.pi * 440 * t / rate_in)) for t in range(n)
    ]
    payload = encode_wav(tone, sample_rate=rate_in)
    df = spark.createDataFrame([(1, payload)], "media_id long, content binary")

    out = ops.resample_audio(df, out_rate=4000).collect()[0]
    assert (out.sample_rate, out.n_samples) == (4000, 800)
    got_rate, ch, samples = decode_wav(bytes(out.content))
    assert (got_rate, ch, len(samples)) == (4000, 1, 800)
    assert samples == tone[::2]  # exact NN pick at ratio 2

    # the 440 Hz tone survives: dominant FFT bin at the new rate
    import numpy as np

    spec = np.abs(np.fft.rfft(np.asarray(samples, dtype=np.float64)))
    dom_hz = np.argmax(spec[1:]) + 1  # skip DC
    dom_hz = dom_hz * 4000 / 800
    assert abs(dom_hz - 440) <= 4000 / 800  # within one bin

    # determinism across partitionings
    df6 = spark.createDataFrame(
        [(i, payload) for i in range(6)], "media_id long, content binary"
    )
    a = {r.media_id: r.content_sha256 for r in ops.resample_audio(df6.repartition(5), 4000).collect()}
    b = {r.media_id: r.content_sha256 for r in ops.resample_audio(df6.repartition(2), 4000).collect()}
    assert a == b and len(set(a.values())) == 1


def test_audio_frames_layout_and_energy(spark):
    """audio_frames: frame count = 1 + (n - len)//hop, placement exact
    (start_sample = i*hop), last partial frame zero-padded and flagged,
    per-frame RMS matches numpy on the same slices, and framing is
    deterministic across partitionings."""
    import math

    import numpy as np

    from azure_etl_databricks_sql_powerbi_spark.multimodal import ops
    from azure_etl_databricks_sql_powerbi_spark.multimodal.wav import encode_wav

    rate, n = 8000, 1000
    tone = [int(8000 * math.sin(2 * math.pi * 100 * t / rate)) for t in range(n)]
    payload = encode_wav(tone, sample_rate=rate)
    df = spark.createDataFrame([(1, payload)], "media_id long, content binary")

    rows = sorted(
        ops.audio_frames(df, frame_len=400, hop=160).collect(),
        key=lambda r: r.frame_idx,
    )
    # 1 + (1000-400)//160 = 4 frames
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    assert [r.start_sample for r in rows] == [0, 160, 320, 480]
    # frames 0-2 full; frame 3 covers samples 480..880 -> full too
    assert all(r.n_samples == 400 for r in rows)
    x = np.asarray(tone, dtype=np.float64)
    for r in rows:
        seg = x[r.start_sample : r.start_sample + 400]
        assert abs(r.rms - float(np.sqrt(np.mean(seg * seg)))) < 1e-9

    # short clip: one zero-padded frame, flagged by n_samples < frame_len
    short = encode_wav(tone[:100], sample_rate=rate)
    sdf = spark.createDataFrame([(2, short)], "media_id long, content binary")
    srows = ops.audio_frames(sdf, frame_len=400, hop=160).collect()
    assert len(srows) == 1 and srows[0].n_samples == 100

    with __import__("pytest").raises(ValueError, match="positive"):
        ops.audio_frames(df, frame_len=0)

    df6 = spark.createDataFrame(
        [(i, payload) for i in range(6)], "media_id long, content binary"
    )
    a = {(r.media_id, r.frame_idx): r.frame_sha256
         for r in ops.audio_frames(df6.repartition(5)).collect()}
    b = {(r.media_id, r.frame_idx): r.frame_sha256
         for r in ops.audio_frames(df6.repartition(2)).collect()}
    assert a == b
