"""Image payload handling — same discipline as audio (multimodal/audio.py):

* images travel as an opaque ``binary`` column with typed metadata
  (``width``, ``height``, ``codec``); operators select explicit columns
  so Parquet column pruning never drags the payload through text stages,
* decode happens only inside Arrow-batched UDFs,
* ``rgb8_raw`` (packed HxWx3 uint8) is implemented for real with numpy;
  ``jpeg``/``png`` decode is a clearly-marked STUB (NotImplementedError —
  no imaging libraries in this environment); the dispatch, schema,
  batching and partitioning are real and tested against both.

Video follows the same contract (binary + codec + fps/duration metadata,
frame-sample as a batch UDF); only the container parsers differ.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPORTED_CODECS = ("rgb8_raw",)
STUB_CODECS = ("jpeg", "png")


def decode_image(codec: str, blob: bytes, width: int, height: int) -> np.ndarray:
    """-> (H, W, 3) uint8. jpeg/png are STUBS (no imaging libs here)."""
    if codec == "rgb8_raw":
        arr = np.frombuffer(blob, dtype=np.uint8)
        if arr.size != width * height * 3:
            raise ValueError(f"rgb8_raw size mismatch: {arr.size} != {width}x{height}x3")
        return arr.reshape(height, width, 3)
    if codec in STUB_CODECS:
        # STUB: real decode needs libjpeg/libpng bindings, unavailable in
        # this environment. Dispatch/schema/batching are real.
        raise NotImplementedError(f"decode for codec '{codec}' is stubbed out")
    raise ValueError(f"unknown codec: {codec}")


def encode_rgb8(img: np.ndarray) -> bytes:
    return np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def resize_images(
    images: DataFrame, out_w: int, out_h: int, id_col: str = "img_id"
) -> DataFrame:
    """(id, bytes, width, height, codec) with the payload resized
    (nearest-neighbor). Stub codecs yield no row (counted upstream via
    image_meta's ok flag)."""
    src = images.select(id_col, "bytes", "width", "height", "codec")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    img = decode_image(r.codec, bytes(r.bytes), r.width, r.height)
                except NotImplementedError:
                    continue
                out = resize_nearest(img, out_w, out_h)
                rows.append((getattr(r, id_col), encode_rgb8(out), out_w, out_h, "rgb8_raw"))
            yield pd.DataFrame(
                rows, columns=[id_col, "bytes", "width", "height", "codec"]
            )

    return src.mapInPandas(
        compute,
        schema=f"{id_col} string, bytes binary, width int, height int, codec string",
    )


def image_features(images: DataFrame, id_col: str = "img_id") -> DataFrame:
    """(id, mean_r, mean_g, mean_b, luma_hist array<double>[8]) — batch
    UDF, numpy only; stub codecs yield nulls (plumbing exercised)."""
    src = images.select(id_col, "bytes", "width", "height", "codec")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mr, mg, mb, hist = [], [], [], [], []
            for r in pdf.itertuples(index=False):
                ids.append(getattr(r, id_col))
                try:
                    img = decode_image(r.codec, bytes(r.bytes), r.width, r.height)
                except NotImplementedError:
                    mr.append(None), mg.append(None), mb.append(None), hist.append(None)
                    continue
                means = img.reshape(-1, 3).mean(axis=0)
                mr.append(round(float(means[0]), 6))
                mg.append(round(float(means[1]), 6))
                mb.append(round(float(means[2]), 6))
                luma = img @ np.array([0.299, 0.587, 0.114])
                h, _ = np.histogram(luma, bins=8, range=(0, 256))
                hist.append((h / max(1, luma.size)).round(6).tolist())
            yield pd.DataFrame(
                {id_col: ids, "mean_r": mr, "mean_g": mg, "mean_b": mb, "luma_hist": hist}
            )

    return src.mapInPandas(
        compute,
        schema=(
            f"{id_col} string, mean_r double, mean_g double, mean_b double,"
            " luma_hist array<double>"
        ),
    )


def generate_images(
    spark, n_rows: int, *, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic synthetic image table (gradient + seeded noise);
    every 5th row is a jpeg STUB row so the skip path is always exercised."""
    partitions = partitions or max(4, n_rows // 4096)
    base = spark.range(0, n_rows, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng([seed, i])
                w, h = int(rng.integers(16, 33)), int(rng.integers(16, 33))
                if i % 5 == 4:
                    rows.append((f"img-{i:06d}", b"\xff\xd8stub", w, h, "jpeg"))
                    continue
                grad = np.linspace(0, 255, w, dtype=np.uint8)[None, :, None]
                img = np.broadcast_to(grad, (h, w, 3)).copy()
                img = np.clip(
                    img.astype(np.int16) + rng.integers(-8, 9, size=img.shape), 0, 255
                ).astype(np.uint8)
                rows.append((f"img-{i:06d}", encode_rgb8(img), w, h, "rgb8_raw"))
            yield pd.DataFrame(
                rows, columns=["img_id", "bytes", "width", "height", "codec"]
            )

    return base.mapInPandas(
        gen, schema="img_id string, bytes binary, width int, height int, codec string"
    )
