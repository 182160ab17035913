"""Image-modality plumbing: binary payload + typed metadata, real
rgb8_raw codec, stubbed jpeg/png, resize + features as batch UDFs."""

import numpy as np
import pytest

from cc_net_spark.multimodal import image as im


def test_codec_roundtrip_and_stub():
    img = np.arange(16 * 8 * 3, dtype=np.uint8).reshape(8, 16, 3)
    blob = im.encode_rgb8(img)
    back = im.decode_image("rgb8_raw", blob, 16, 8)
    assert (back == img).all()
    with pytest.raises(NotImplementedError):
        im.decode_image("jpeg", b"\xff\xd8", 4, 4)
    with pytest.raises(ValueError):
        im.decode_image("rgb8_raw", blob[:-1], 16, 8)


def test_resize_and_features(spark):
    n = 40
    images = im.generate_images(spark, n, seed=42)
    resized = im.resize_images(images, 8, 8)
    rows = resized.collect()
    # every 5th row is a stubbed jpeg -> skipped
    assert len(rows) == n - n // 5
    for r in rows:
        assert (r["width"], r["height"], r["codec"]) == (8, 8, "rgb8_raw")
        assert len(bytes(r["bytes"])) == 8 * 8 * 3
    feats = {r["img_id"]: r for r in im.image_features(images).collect()}
    assert len(feats) == n
    stub = feats["img-000004"]
    assert stub["mean_r"] is None and stub["luma_hist"] is None
    real = feats["img-000000"]
    assert 0 <= real["mean_r"] <= 255 and abs(sum(real["luma_hist"]) - 1.0) < 1e-6
    # horizontal gradient: right half brighter than left half
    again = {r["img_id"]: r["mean_r"] for r in im.image_features(images).collect()}
    assert again == {k: v["mean_r"] for k, v in feats.items()}  # deterministic


def test_resize_preserves_gradient_structure(spark):
    images = im.generate_images(spark, 8, seed=7).filter("codec = 'rgb8_raw'")
    small = im.resize_images(images, 4, 4).collect()
    for r in small:
        img = im.decode_image("rgb8_raw", bytes(r["bytes"]), 4, 4)
        # gradient increases left -> right (noise is +-8 on a 0..255 ramp)
        assert img[:, 0].mean() < img[:, -1].mean()
