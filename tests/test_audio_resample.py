"""Audio resampling (multimodal/audio.resample) — exact integer-domain
linear interpolation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cc_net_spark.multimodal.audio import (
    _resample_int16,
    resample,
    snr_db,
    wav_decode_int16,
    wav_encode_int16,
)


def test_identity_when_rates_match():
    x = np.array([5, -7, 32767, -32768, 0], dtype=np.int16)
    y, y_scaled = _resample_int16(x, 8000, 8000)
    assert np.array_equal(y, x)
    assert np.array_equal(y_scaled, x.astype(np.int64) * 8000)


def test_hand_computed_2x_upsample():
    # 2x upsample: even outputs hit inputs exactly, odd outputs are the
    # midpoint (floor division)
    x = np.array([0, 100, -100], dtype=np.int16)
    y, _ = _resample_int16(x, 1000, 2000)
    assert y.tolist() == [0, 50, 100, 0, -100, -100]  # last clamps to x[-1]


def test_downsample_indices():
    x = np.arange(0, 60, 10, dtype=np.int16)  # 0..50 step 10, n=6
    y, _ = _resample_int16(x, 3000, 1000)  # keep every 3rd sample exactly
    assert y.tolist() == [0, 30]


def test_roundtrip_snr_on_sine():
    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    up, _ = _resample_int16(pcm, sr, 12000)
    back, _ = _resample_int16(up, 12000, sr)
    n = min(len(pcm), len(back))
    s = snr_db(pcm[:n].astype(np.float64) / 32768, back[:n].astype(np.float64) / 32768)
    # linear interp of a 440 Hz tone at 8 kHz measures ~37 dB — above the
    # repo-wide 30 dB PCM-equivalence floor (BASELINE.json input_hint)
    assert s > 30.0


def test_wav_int16_roundtrip():
    x = np.array([1, -2, 3], dtype=np.int16)
    sr, back = wav_decode_int16(wav_encode_int16(x, 16000))
    assert sr == 16000 and np.array_equal(back, x)


def test_spark_resample_matches_local_math(spark):
    from cc_net_spark.sources import synth

    clips = synth.generate_clips(spark, 12, seed=7, with_audio=True)
    out = resample(clips, 12000, audit=True).collect()
    src = {r["clip_id"]: bytes(r["bytes"]) for r in clips.collect()}
    assert len(out) == 12
    for r in out:
        sr_in, x = wav_decode_int16(src[r["clip_id"]])
        y, y_scaled = _resample_int16(x, sr_in, 12000)
        assert r["sr_hz"] == 12000
        assert r["n_out"] == len(y)
        k = np.arange(len(y_scaled), dtype=np.int64)
        assert r["chk"] == int(((k % 97 + 1) * y_scaled).sum())
        assert r["abs_sum"] == int(np.abs(y_scaled).sum())
        sr_out, got = wav_decode_int16(bytes(r["bytes"]))
        assert sr_out == 12000 and np.array_equal(got, y)
        # duration preserved within one sample's worth of ms
        assert abs(len(y) / 12000 - len(x) / sr_in) <= 1.0 / 12000


def test_stub_codec_passthrough(spark):
    df = spark.createDataFrame(
        [("c1", b"\x00", "flac", 100)], ["clip_id", "bytes", "codec", "dur_ms"]
    )
    row = resample(df, 12000, audit=True).collect()[0]
    assert row["bytes"] is None and row["n_out"] is None and row["chk"] is None


def test_unknown_codec_raises(spark):
    df = spark.createDataFrame(
        [("c1", b"\x00", "mp9", 100)], ["clip_id", "bytes", "codec", "dur_ms"]
    )
    with pytest.raises(Exception, match="unknown codec"):
        resample(df, 12000).collect()


def test_degenerate_clip_yields_zero_output_row(spark):
    """A clip too short to produce any resampled sample (n*target//sr==0)
    emits an n_out=0 row from the operator; the differential gate query
    excludes such rows because the SQL oracle's GROUP BY cannot emit
    them (queries.q_audio_resample filters n_out > 0)."""
    # one sample at 16 kHz -> 1*12000//16000 == 0 output samples
    blob = wav_encode_int16(np.array([1234], dtype=np.int16), 16000)
    df = spark.createDataFrame(
        [("tiny", blob, "pcm_s16le", 0)], ["clip_id", "bytes", "codec", "dur_ms"]
    )
    row = resample(df, 12000, audit=True).collect()[0]
    assert row["n_out"] == 0 and row["chk"] == 0 and row["abs_sum"] == 0
    sr, y = wav_decode_int16(bytes(row["bytes"]))
    assert sr == 12000 and len(y) == 0
