"""Video-modality plumbing: binary payload + typed metadata, real
rgb8_frames codec, stubbed h264/vp9, frame sampling as a batch UDF."""

import numpy as np
import pytest

from cc_net_spark.multimodal import video as vd


def test_codec_roundtrip_and_stub():
    vid = np.arange(2 * 4 * 3 * 3, dtype=np.uint8).reshape(2, 4, 3, 3)
    back = vd.decode_video("rgb8_frames", vid.tobytes(), 3, 4, 2)
    assert (back == vid).all()
    with pytest.raises(NotImplementedError):
        vd.decode_video("h264", b"\x00", 3, 4, 2)
    with pytest.raises(ValueError):
        vd.decode_video("rgb8_frames", vid.tobytes()[:-1], 3, 4, 2)


def test_frame_sample(spark):
    n = 24
    videos = vd.generate_videos(spark, n, seed=42)
    out = vd.frame_sample(videos, every=4)
    rows = out.collect()
    # every 4th row is a stubbed h264 -> skipped entirely
    ids = {r["vid_id"] for r in rows}
    assert ids == {f"vid-{i:06d}" for i in range(n) if i % 4 != 3}
    # sampled frame indices are the 0,4,8,... stride
    per = {}
    for r in rows:
        per.setdefault(r["vid_id"], []).append(r["frame_idx"])
    for v, idxs in per.items():
        assert sorted(idxs) == list(range(0, max(idxs) + 1, 4))
    # brightness ramp: later sampled frames are brighter
    for v, idxs in per.items():
        lums = {r["frame_idx"]: r["mean_luma"] for r in rows if r["vid_id"] == v}
        s = sorted(lums)
        assert lums[s[0]] < lums[s[-1]]
    # deterministic
    again = {(r["vid_id"], r["frame_idx"], r["mean_luma"]) for r in vd.frame_sample(
        vd.generate_videos(spark, n, seed=42), every=4).collect()}
    assert again == {(r["vid_id"], r["frame_idx"], r["mean_luma"]) for r in rows}
