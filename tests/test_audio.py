"""WAV codec + audio operators (llmdata/audio.py).

Codec round-trips are pure-python; the Spark paths run on the session
fixture. The integer-exact stats surface is additionally covered by
the ``audio_stats`` extras oracle (scripts/check_oracle.py --extras).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from stock_indicators_etl_spark.llmdata import audio as au
from stock_indicators_etl_spark.llmdata.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    real_decoder,
)


def _sine_int16(f=440, sr=8000, n=4000, amp=12000):
    t = np.arange(n) / sr
    return np.rint(amp * np.sin(2 * np.pi * f * t)).astype(np.int64)


# ---------------------------------------------------------------------------
# codec round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_wav_roundtrip_pcm(bits):
    rng = np.random.default_rng(3)
    lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    x = rng.integers(lo, hi, size=(777, 2), endpoint=True)
    payload = au.encode_wav(x, 11025, bits=bits)
    samples, sr = au.decode_wav(payload)
    assert sr == 11025
    assert samples.shape == (777, 2)
    np.testing.assert_array_equal(samples, x)


def test_wav_roundtrip_float32():
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, size=(500, 1)).astype(np.float32)
    samples, sr = au.decode_wav(au.encode_wav(x, 16000, bits=-32))
    assert sr == 16000
    np.testing.assert_array_equal(samples, x)


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        au.decode_wav(b"OggS" + b"\x00" * 64)


def test_wav_skips_extra_chunks():
    x = _sine_int16(n=64)
    payload = au.encode_wav(x, 8000, bits=16)
    # splice a LIST chunk between fmt and data
    fmt_end = payload.index(b"data")
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOabc" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    samples, sr = au.decode_wav(spliced)
    np.testing.assert_array_equal(samples[:, 0], x)


# ---------------------------------------------------------------------------
# feature kernels
# ---------------------------------------------------------------------------


def test_audio_decoder_sine_features():
    sr, f = 8000, 440
    payload = au.encode_wav(_sine_int16(f=f, sr=sr), sr, bits=16)
    feats = au.audio_decoder(payload, "audio")
    assert feats.shape == (FEATURE_DIM,)
    assert feats[0] == pytest.approx(0.5, rel=1e-3)  # 4000/8000 s
    assert feats[1] == pytest.approx(12000 / 32768 / np.sqrt(2), rel=1e-2)
    # a sine crosses zero twice per cycle
    assert feats[2] == pytest.approx(2 * f, rel=2e-2)
    # spectral centroid of a pure tone ≈ the tone
    assert feats[3] == pytest.approx(f, rel=2e-2)
    assert feats[4] < 50  # narrowband
    assert feats[5] == pytest.approx(f, rel=2e-2)  # rolloff at the tone


def test_real_decoder_dispatches_wav():
    payload = au.encode_wav(_sine_int16(), 8000, bits=16)
    feats = real_decoder(payload, "audio")
    assert feats.shape == (FEATURE_DIM,)
    assert feats[3] == pytest.approx(440, rel=2e-2)


def test_resample_wav_halves_length():
    payload = au.encode_wav(_sine_int16(sr=8000, n=4000), 8000, bits=16)
    out, sr = au.decode_wav(au.resample_wav(payload, 4000))
    assert sr == 4000
    assert abs(out.shape[0] - 2000) <= 1
    # tone survives resample: centroid still ~440 Hz
    feats = au.audio_decoder(au.resample_wav(payload, 4000), "audio")
    assert feats[3] == pytest.approx(440, rel=5e-2)


def test_synth_wave_matches_oracle_formula():
    s = au.synth_wave_int16(7, n=16, sr=8000)
    f = 200 + (7 % 32) * 25
    expect = [((i * f) % 8000) * 65535 // 8000 - 32768 for i in range(16)]
    assert s.tolist() == expect
    assert s.min() >= -32768 and s.max() <= 32767


# ---------------------------------------------------------------------------
# Spark operator paths
# ---------------------------------------------------------------------------


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 5, 31, 33], "text": ["x"] * 5})
    )


def test_documents_as_audio_and_stats(spark, docs_df):
    media = au.documents_as_audio(docs_df)
    stats = au.audio_stats(media).toPandas().set_index("media_id").sort_index()
    assert stats.shape[0] == 5
    for did in stats.index:
        s = au.synth_wave_int16(did)
        nonneg = s >= 0
        assert stats.loc[did, "sum_sq"] == int(np.dot(s, s))
        assert stats.loc[did, "peak"] == int(np.abs(s).max())
        assert stats.loc[did, "zero_crossings"] == int(
            np.count_nonzero(nonneg[1:] != nonneg[:-1])
        )
        assert stats.loc[did, "duration_ms"] == 256
    # doc 1 and 33 share f (33 % 32 == 1) → identical clips
    assert (
        stats.loc[1, ["sum_sq", "peak", "zero_crossings"]].tolist()
        == stats.loc[33, ["sum_sq", "peak", "zero_crossings"]].tolist()
    )


def test_extract_media_features_with_audio_decoder(spark, docs_df):
    media = au.documents_as_audio(docs_df)
    feats = extract_media_features(media, decoder=au.audio_decoder).toPandas()
    assert feats.shape[0] == 5
    arr = np.array(feats["features"].tolist())
    assert arr.shape == (5, FEATURE_DIM)
    assert (arr[:, 0] == pytest.approx(0.256, rel=1e-3))  # 2048/8000 s


def test_frame_audio_features(spark, docs_df):
    media = au.documents_as_audio(docs_df)
    frames = au.frame_audio_features(media, frame_ms=25, hop_ms=10).toPandas()
    # 2048 samples @8k = 256 ms → floor((2048-200)/80)+1 = 24 frames/clip
    per = frames.groupby("media_id").size()
    assert (per == 24).all()
    assert frames["rms"].between(0, 1).all()
    assert frames["zcr"].between(0, 1).all()
    # hop spacing in ms
    one = frames[frames["media_id"] == 0].sort_values("frame_idx")
    assert one["ts_ms"].diff().dropna().eq(10).all()


def test_resample_audio_dataframe(spark, docs_df):
    media = au.documents_as_audio(docs_df)
    out = au.resample_audio(media, 4000).toPandas()
    assert (out["sample_rate"] == 4000).all()
    samples, sr = au.decode_wav(bytes(out["payload"].iloc[0]))
    assert sr == 4000
    assert abs(samples.shape[0] - 1024) <= 1
