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
    feats = ops.decode_image_features(media, dim=8)
    assert feats.schema == ops.IMAGE_FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
        assert len(r["embedding"]) == 8
        norm = sum(x * x for x in r["embedding"]) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-3)
    # deterministic across runs
    again = {r["media_id"]: r["embedding"] for r in ops.decode_image_features(media, dim=8).collect()}
    assert {r["media_id"]: r["embedding"] for r in rows} == again


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        ops._decode_image(b"\x89PNG....")


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


def test_decode_image_raises_without_codec():
    """Sandbox path: no PIL -> loud NotImplementedError, never silent."""
    import pytest

    from azure_etl_databricks_sql_powerbi_spark.multimodal.ops import _decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; covered by test_decode_image_real_pil")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="fake_features=True"):
        _decode_image(b"\x89PNG")


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
