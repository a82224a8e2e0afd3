"""GIF codec + real frame sampling (llmdata/gif.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from stock_indicators_etl_spark.llmdata import gif as G
from stock_indicators_etl_spark.llmdata.multimodal import (
    decode_image,
    image_decoder,
)


@pytest.fixture(scope="module")
def pal():
    rng = np.random.default_rng(1)
    return rng.integers(0, 256, (8, 3)).astype(np.uint8)


def test_single_frame_roundtrip(pal):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 8, (23, 31))
    frames, delays = G.decode_gif(G.encode_gif(img, pal))
    assert frames.shape == (1, 23, 31, 3)
    np.testing.assert_array_equal(frames[0], pal[img])
    assert delays == [0]


def test_256_color_and_width_growth():
    rng = np.random.default_rng(3)
    pal256 = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    img = rng.integers(0, 256, (100, 100))  # forces 12-bit cap + CLEAR
    frames, _ = G.decode_gif(G.encode_gif(img, pal256))
    np.testing.assert_array_equal(frames[0], pal256[img])


def test_interlace_roundtrip(pal):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 8, (19, 13))
    frames, _ = G.decode_gif(G.encode_gif(img, pal, interlace=True))
    np.testing.assert_array_equal(frames[0], pal[img])


def test_animation_composition_and_transparency(pal):
    anim = np.stack(
        [np.full((10, 10), 1), np.full((10, 10), 2), np.full((10, 10), 3)]
    )
    anim[1, :5, :5] = 0  # transparent in frame 1 → frame-0 pixels persist
    frames, delays = G.decode_gif(
        G.encode_gif(anim, pal, delays_ms=[100, 200, 300], transparent=0)
    )
    assert delays == [100, 200, 300]
    np.testing.assert_array_equal(frames[1][0, 0], pal[1])  # held pixel
    np.testing.assert_array_equal(frames[1][6, 6], pal[2])  # painted pixel
    np.testing.assert_array_equal(frames[2][0, 0], pal[3])


def test_rejects_non_gif():
    with pytest.raises(ValueError):
        G.decode_gif(b"NOTAGIF" + b"\x00" * 16)


def test_decode_image_dispatches_gif(pal):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 8, (6, 7))
    out = decode_image(G.encode_gif(img, pal))
    np.testing.assert_array_equal(out, pal[img])
    feats = image_decoder(G.encode_gif(img, pal), "image")
    assert feats.sum() == pytest.approx(1.0, abs=1e-5)


def test_sample_gif_frames_spark(spark, pal):
    rng = np.random.default_rng(6)
    rows = []
    for mid in range(3):
        anim = rng.integers(0, 8, (4, 12, 16))
        payload = G.encode_gif(anim, pal, delays_ms=[100] * 4)
        rows.append(
            {
                "media_id": mid,
                "kind": "video",
                "payload": payload,
                "meta": {"mime": "image/gif", "width": 16, "height": 12,
                         "duration_ms": 400},
            }
        )
    media = spark.createDataFrame(pd.DataFrame(rows))
    out = G.sample_gif_frames(media, every_ms=100, max_frames=8).toPandas()
    assert out.groupby("media_id").size().eq(4).all()
    assert set(out.ts_ms) == {0, 100, 200, 300}
    assert (out.width == 16).all() and (out.height == 12).all()
    # each emitted frame is a decodable PPM with real pixels
    first = out[(out.media_id == 0) & (out.frame_idx == 0)].frame.iloc[0]
    img = decode_image(bytes(first))
    assert img.shape == (12, 16, 3)
