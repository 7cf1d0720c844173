"""Multimodal plumbing tests: schema, Arrow batch shape, determinism,
real-decoder seam, frame-sample plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filipo_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    frame_sample_plan,
    gen_media,
)

from tests.conftest import df_rows


def test_feature_extraction_deterministic(spark):
    media = gen_media(spark, n=60, seed=7)
    f1 = extract_features(media, dim=8)
    assert f1.schema == FEATURE_SCHEMA
    rows1 = df_rows(f1.select("media_id", "kind", "n_bytes"))
    assert len(rows1) == 60
    f2 = extract_features(gen_media(spark, n=60, seed=7), dim=8)
    assert rows1 == df_rows(f2.select("media_id", "kind", "n_bytes"))
    feat = f1.where("media_id = 0").collect()[0]["feature"]
    assert len(feat) == 8 and all(0.0 <= x <= 1.0 for x in feat)


def test_real_decoder_seam_raises(spark):
    media = gen_media(spark, n=5)
    with pytest.raises(Exception, match="NotImplementedError|real decoders"):
        extract_features(media, decoder="real").collect()


def test_resize_images_geometry_and_seam(spark):
    """Resize: aspect-preserving fit computed JVM-side; fake kernel
    shrinks payloads proportionally; real seam raises."""
    from filipo_spark.functions.multimodal import RESIZE_SCHEMA, resize_images

    media = gen_media(spark, n=80, seed=7)
    out = resize_images(media, max_side=100)
    assert out.schema == RESIZE_SCHEMA
    rows = out.collect()
    n_imgs = media.where("kind = 'image'").count()
    assert len(rows) == n_imgs
    for r in rows:
        assert max(r["width"], r["height"]) <= 100
        # aspect preserved within floor rounding
        if r["src_width"] >= r["src_height"]:
            assert r["width"] >= r["height"]
        else:
            assert r["height"] >= r["width"]
        # never upscale beyond source, payload shrank with pixel count
        assert r["width"] <= r["src_width"] and r["height"] <= r["src_height"]
        assert r["payload"] is not None and len(r["payload"]) >= 1
    with pytest.raises(Exception, match="NotImplementedError|real image resize"):
        resize_images(media, decoder="real").collect()


def test_frame_sample_plan(spark):
    media = gen_media(spark, n=100, seed=7)
    plan = frame_sample_plan(media, every_ms=5000)
    vids = media.where("kind = 'video'")
    got = plan.groupBy("media_id").count().collect()
    durs = {r["media_id"]: r["duration_ms"] for r in vids.collect()}
    for r in got:
        expected = (durs[r["media_id"]] - 1) // 5000 + 1
        assert r["count"] == expected


def test_bmp_roundtrip_geometry_and_padding(spark):
    """The numpy BMP codec is a REAL decode path: header geometry,
    BGR→RGB channel order, and the 4-byte row stride must all be
    honored — widths not divisible by 4 exercise the padding."""
    from filipo_spark.functions.multimodal import (
        _bmp_decode,
        _bmp_encode,
        encode_bmp_images,
        image_geometry,
    )

    # direct kernel roundtrip at awkward widths (stride padding 1..3)
    for w, h, rgb in [(9, 3, (10, 200, 30)), (10, 4, (0, 0, 255)), (11, 5, (7, 8, 9))]:
        got = _bmp_decode(_bmp_encode(w, h, rgb))
        assert got == (w, h, float(rgb[0]), float(rgb[1]), float(rgb[2]))

    # through the Arrow transport, against the doc_id arithmetic
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    rows = image_geometry(encode_bmp_images(docs)).collect()
    assert len(rows) == 40
    for r in rows:
        i = r["doc_id"]
        assert (r["width"], r["height"]) == (i * 7 % 57 + 8, i * 13 % 41 + 8)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            i * 3 % 256, i * 5 % 256, i * 11 % 256
        )
        stride = (3 * r["width"] + 3) // 4 * 4
        assert r["n_bytes"] == 54 + r["height"] * stride

    # corrupted payloads fail loudly, never silently zero
    with pytest.raises(ValueError, match="not a BMP"):
        _bmp_decode(b"PNG....")
