"""Video payload handling — third modality, same discipline as
audio.py / image.py:

* video travels as an opaque ``binary`` column with typed metadata
  (``width``, ``height``, ``fps``, ``n_frames``, ``codec``),
* decode only inside Arrow-batched UDFs; operators select explicit
  columns so the payload never rides through text stages,
* ``rgb8_frames`` (concatenated packed HxWx3 uint8 frames) is
  implemented for real with numpy; ``h264``/``vp9`` decode is a
  clearly-marked STUB (NotImplementedError — no codec libraries in this
  environment); dispatch, schema, batching and frame-stride plumbing
  are real and tested against both.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SUPPORTED_CODECS = ("rgb8_frames",)
STUB_CODECS = ("h264", "vp9")


def decode_video(
    codec: str, blob: bytes, width: int, height: int, n_frames: int
) -> np.ndarray:
    """-> (n_frames, H, W, 3) uint8. h264/vp9 are STUBS (no codec libs)."""
    if codec == "rgb8_frames":
        arr = np.frombuffer(blob, dtype=np.uint8)
        expect = n_frames * width * height * 3
        if arr.size != expect:
            raise ValueError(f"rgb8_frames size mismatch: {arr.size} != {expect}")
        return arr.reshape(n_frames, height, width, 3)
    if codec in STUB_CODECS:
        # STUB: real decode needs libavcodec bindings, unavailable here.
        raise NotImplementedError(f"decode for codec '{codec}' is stubbed out")
    raise ValueError(f"unknown codec: {codec}")


def frame_sample(
    videos: DataFrame, id_col: str = "vid_id", *, every: int = 4
) -> DataFrame:
    """(id, frame_idx, mean_luma): keep every k-th frame with its mean
    luminance — the video frame-sampling primitive (one row per sampled
    frame; batch UDF, numpy only). Stub codecs yield no rows."""
    src = videos.select(id_col, "bytes", "width", "height", "n_frames", "codec")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w_luma = np.array([0.299, 0.587, 0.114])
        for pdf in batches:
            ids, idxs, lumas = [], [], []
            for r in pdf.itertuples(index=False):
                try:
                    vid = decode_video(
                        r.codec, bytes(r.bytes), r.width, r.height, r.n_frames
                    )
                except NotImplementedError:
                    continue
                sel = np.arange(0, len(vid), every)
                vals = (vid[sel].astype(np.float64) @ w_luma).mean(axis=(1, 2))
                ids.extend([getattr(r, id_col)] * len(sel))
                idxs.extend(sel.tolist())
                lumas.extend(np.round(vals, 6).tolist())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "mean_luma": lumas})

    return src.mapInPandas(
        compute, schema=f"{id_col} string, frame_idx long, mean_luma double"
    )


def generate_videos(
    spark, n_rows: int, *, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic synthetic video table (per-frame brightness ramp +
    seeded noise); every 4th row is an h264 STUB row so the skip path is
    always exercised."""
    partitions = partitions or max(4, n_rows // 4096)
    base = spark.range(0, n_rows, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng([seed, 17, i])
                w, h = int(rng.integers(8, 17)), int(rng.integers(8, 17))
                nf = int(rng.integers(8, 25))
                if i % 4 == 3:
                    rows.append((f"vid-{i:06d}", b"\x00stub", w, h, nf, 12, "h264"))
                    continue
                ramp = np.linspace(16, 240, nf)[:, None, None, None]
                vid = np.broadcast_to(ramp, (nf, h, w, 3)).copy()
                vid = np.clip(
                    vid + rng.integers(-6, 7, size=vid.shape), 0, 255
                ).astype(np.uint8)
                rows.append(
                    (f"vid-{i:06d}", vid.tobytes(), w, h, nf, 12, "rgb8_frames")
                )
            yield pd.DataFrame(
                rows,
                columns=["vid_id", "bytes", "width", "height", "n_frames", "fps", "codec"],
            )

    return base.mapInPandas(
        gen,
        schema=(
            "vid_id string, bytes binary, width int, height int,"
            " n_frames int, fps int, codec string"
        ),
    )
