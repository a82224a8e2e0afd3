"""Baseline JPEG codec (llmdata/jpeg.py) — round-trips through every
decoder branch plus spec-order pins (the zigzag table and the DQT
zigzag convention are asserted against hardcoded known sequences so a
self-consistent-but-wrong permutation cannot pass)."""

from __future__ import annotations

import numpy as np
import pytest

from stock_indicators_etl_spark.llmdata import jpeg as J
from stock_indicators_etl_spark.llmdata.multimodal import (
    FEATURE_DIM,
    decode_image,
    image_decoder,
    image_resize,
    real_decoder,
)


def _gradient_rgb(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(
        np.stack(
            [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)], axis=2
        )
        + rng.normal(0, 3, (h, w, 3)),
        0,
        255,
    ).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-12))


# ---------------------------------------------------------------------------
# spec-order pins (not round-trip-blind)
# ---------------------------------------------------------------------------


def test_zigzag_is_the_standard_sequence():
    # the first 16 and last 8 entries of T.81's zigzag, transcribed
    # from the spec figure — pins the programmatic generation
    assert J.ZIGZAG[:16].tolist() == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    ]
    assert J.ZIGZAG[-8:].tolist() == [46, 53, 60, 61, 54, 47, 55, 62, 63][-8:]
    # bijection
    assert sorted(J.ZIGZAG.tolist()) == list(range(64))


def test_dqt_is_emitted_in_zigzag_order():
    img = np.full((8, 8), 128, dtype=np.uint8)
    enc = J.encode_jpeg(img, quality=90)
    i = enc.index(b"\xff\xdb")
    stream = np.frombuffer(enc[i + 5 : i + 5 + 64], dtype=np.uint8).astype(
        np.int64
    )
    natural = J._quant_table(90, chroma=False)
    np.testing.assert_array_equal(stream, natural[J.ZIGZAG])


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------


def test_roundtrip_gray():
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:40, 0:56]
    gray = np.clip(xx * 3 + yy * 2 + rng.normal(0, 4, (40, 56)), 0, 255).astype(
        np.uint8
    )
    dec = J.decode_jpeg(J.encode_jpeg(gray, quality=90))
    assert dec.shape == gray.shape
    assert _psnr(dec, gray) > 30


@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_rgb(sub):
    rgb = _gradient_rgb()
    dec = J.decode_jpeg(J.encode_jpeg(rgb, quality=90, subsample=sub))
    assert dec.shape == rgb.shape
    assert _psnr(dec, rgb) > (30 if sub == "444" else 26)


def test_restart_markers_do_not_change_pixels():
    rgb = _gradient_rgb(33, 47, seed=1)
    base = J.decode_jpeg(J.encode_jpeg(rgb, quality=85, subsample="420"))
    rst = J.decode_jpeg(
        J.encode_jpeg(rgb, quality=85, subsample="420", restart_interval=2)
    )
    np.testing.assert_array_equal(base, rst)


def test_16bit_quant_tables():
    rgb = _gradient_rgb(24, 24, seed=3)
    a = J.decode_jpeg(J.encode_jpeg(rgb, quality=85, force_16bit_qt=True))
    b = J.decode_jpeg(J.encode_jpeg(rgb, quality=85))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shape", [(1, 1), (1, 9), (9, 1), (17, 16)])
def test_non_multiple_of_8_sizes(shape):
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, shape).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(g, quality=95))
    assert dec.shape == shape


def test_higher_quality_means_higher_psnr():
    rgb = _gradient_rgb(32, 32, seed=5)
    lo = _psnr(J.decode_jpeg(J.encode_jpeg(rgb, quality=30)), rgb)
    hi = _psnr(J.decode_jpeg(J.encode_jpeg(rgb, quality=95)), rgb)
    assert hi > lo


# ---------------------------------------------------------------------------
# honest rejections
# ---------------------------------------------------------------------------


def test_lossless_and_hierarchical_rejected():
    """Arithmetic modes (SOF9/SOF10) now decode; the honest rejection
    narrows to lossless and hierarchical modes."""
    for sof in (0xC3, 0xC5, 0xC7, 0xCB, 0xCE, 0xCF):
        enc = bytearray(J.encode_jpeg(_gradient_rgb(16, 16)))
        i = enc.index(b"\xff\xc0")
        enc[i + 1] = sof
        with pytest.raises(NotImplementedError):
            J.decode_jpeg(bytes(enc))


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("successive", [False, True])
@pytest.mark.parametrize(
    "shape,sub",
    [((41, 53), None), ((33, 47, 3), "444"), ((33, 47, 3), "420"),
     ((8, 8), None)],
)
def test_progressive_decodes_identical_to_baseline(shape, sub, successive):
    """Progressive re-orders the SAME quantized coefficients across
    scans (spectral selection; with successive=True also the Ah/Al
    point-transform refinement), so after all scans the decode must be
    PIXEL-IDENTICAL to the baseline encode of the same image/quality —
    the strongest cross-check the two scan architectures allow."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    kw = {} if sub is None else {"subsample": sub}
    base = J.decode_jpeg(J.encode_jpeg(img, quality=85, **kw))
    prog_bytes = J.encode_jpeg(
        img, quality=85, progressive=True, successive=successive, **kw
    )
    assert prog_bytes[:2] == b"\xff\xd8"
    assert b"\xff\xc2" in prog_bytes  # SOF2
    assert b"\xff\xc0" not in prog_bytes
    prog = J.decode_jpeg(prog_bytes)
    assert np.array_equal(base, prog)


def test_progressive_multiple_scans_present():
    """The scan script really is progressive: >= 3 SOS markers (DC +
    two AC bands), >= 5 with successive approximation (refinements)."""
    img = np.random.default_rng(1).integers(0, 256, (24, 24)).astype(np.uint8)
    spectral = J.encode_jpeg(img, progressive=True, successive=False)
    succ = J.encode_jpeg(img, progressive=True, successive=True)
    assert spectral.count(b"\xff\xda") == 3
    assert succ.count(b"\xff\xda") == 5


def test_progressive_smooth_image_eob_runs():
    """A smooth gradient maximizes cross-block EOB runs (the hardest
    decoder path); still bit-identical to baseline."""
    yy, xx = np.mgrid[0:64, 0:64]
    img = ((yy + xx) * 2 % 256).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, quality=30))
    prog = J.decode_jpeg(J.encode_jpeg(img, quality=30, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_low_and_high_quality():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    for q in (20, 99):
        base = J.decode_jpeg(J.encode_jpeg(img, quality=q, subsample="420"))
        prog = J.decode_jpeg(
            J.encode_jpeg(img, quality=q, subsample="420", progressive=True)
        )
        assert np.array_equal(base, prog)


def test_not_a_jpeg():
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


# ---------------------------------------------------------------------------
# multimodal integration
# ---------------------------------------------------------------------------


def test_decode_image_dispatches_jpeg():
    rgb = _gradient_rgb(16, 24)
    dec = decode_image(J.encode_jpeg(rgb, quality=90))
    assert dec.shape == rgb.shape


def test_image_decoder_and_real_decoder_on_jpeg():
    payload = J.encode_jpeg(_gradient_rgb(16, 16), quality=90)
    for fn in (image_decoder, real_decoder):
        feats = fn(payload, "image")
        assert feats.shape == (FEATURE_DIM,)
        assert feats.sum() == pytest.approx(1.0, abs=1e-5)


def test_image_resize_on_jpeg():
    payload = J.encode_jpeg(_gradient_rgb(32, 32), quality=90)
    out = image_resize(payload, 8, 8)
    assert out[:2] == b"P6"
    assert decode_image(out).shape == (8, 8, 3)


# ---------------------------------------------------------------------------
# arithmetic entropy coding (SOF9/SOF10, llmdata/jpeg_arith.py)
# ---------------------------------------------------------------------------


def test_arith_coder_roundtrip_property():
    """The raw Annex D coder pair: any context-tagged decision
    sequence must decode to itself (200 randomized trials over biased
    per-context bit distributions)."""
    import random

    from stock_indicators_etl_spark.llmdata.jpeg_arith import (
        ArithDecoder,
        ArithEncoder,
    )

    rng = random.Random(7)
    for _ in range(200):
        n_ctx = rng.randint(1, 8)
        probs = [rng.random() for _ in range(n_ctx)]
        seq = [
            (c := rng.randrange(n_ctx), 1 if rng.random() < probs[c] else 0)
            for _ in range(rng.randint(1, 2000))
        ]
        enc = ArithEncoder()
        st = bytearray(n_ctx)
        for c, b in seq:
            enc.encode(st, c, b)
        dec = ArithDecoder(enc.flush())
        st2 = bytearray(n_ctx)
        assert all(dec.decode(st2, c) == b for c, b in seq)


def test_arith_qe_table_structure():
    """Structural pins on the transcribed T.81 Table D.3: 114 entries,
    Qe in (0, 0x8000), successor indices in range, the fast-attack
    states are exactly the SWITCH states, and the fixed bin self-loops."""
    from stock_indicators_etl_spark.llmdata.jpeg_arith import (
        FIXED_BIN,
        QE_TABLE,
    )

    assert len(QE_TABLE) == 114
    switches = []
    for i, (qe, nmps, nlps, sw) in enumerate(QE_TABLE):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < 114 and 0 <= nlps < 114
        if sw:
            switches.append(i)
    assert switches == [0, 14, 36, 64, 80, 88, 95, 105, 110, 112]
    qe, nmps, nlps, sw = QE_TABLE[FIXED_BIN]
    assert (nmps, nlps, sw) == (FIXED_BIN, FIXED_BIN, 0)


@pytest.mark.parametrize(
    "shape,sub,kw",
    [
        ((40, 56), None, {}),
        ((33, 47, 3), "444", {}),
        ((50, 62, 3), "420", {}),
        ((40, 56), None, {"restart_interval": 3}),
        ((34, 42, 3), "420", {"restart_interval": 2}),
        ((8, 8), None, {}),
    ],
)
def test_arith_sequential_decodes_identical_to_huffman(shape, sub, kw):
    """SOF9 must decode to EXACTLY the pixels the Huffman encoding of
    the same quantized coefficients produces — entropy layer only."""
    img = _gradient_rgb(*shape[:2]) if len(shape) == 3 else (
        _gradient_rgb(*shape)[..., 0]
    )
    skw = {"subsample": sub} if sub else {}
    a = J.decode_jpeg(J.encode_jpeg(img, arithmetic=True, **skw, **kw))
    hf = J.decode_jpeg(J.encode_jpeg(img, arithmetic=False, **skw, **kw))
    assert np.array_equal(a, hf)


@pytest.mark.parametrize("successive", [False, True])
@pytest.mark.parametrize(
    "shape,sub",
    [((41, 53), None), ((33, 47, 3), "444"), ((50, 62, 3), "420")],
)
def test_arith_progressive_decodes_identical_to_huffman(
    shape, sub, successive
):
    """SOF10 (progressive arithmetic, G.2): same scan script as the
    Huffman progressive path, identical decoded pixels."""
    img = _gradient_rgb(*shape[:2]) if len(shape) == 3 else (
        _gradient_rgb(*shape)[..., 0]
    )
    skw = {"subsample": sub} if sub else {}
    a = J.decode_jpeg(
        J.encode_jpeg(img, arithmetic=True, progressive=True,
                      successive=successive, **skw)
    )
    hf = J.decode_jpeg(
        J.encode_jpeg(img, arithmetic=False, progressive=True,
                      successive=successive, **skw)
    )
    assert np.array_equal(a, hf)


def test_arith_beats_huffman_size_on_smooth_images():
    """Not a spec requirement, but a strong sanity signal that the
    adaptive probability estimation actually adapts: arithmetic output
    should be smaller than the Huffman encoding of the same image."""
    img = _gradient_rgb(48, 64)
    a = J.encode_jpeg(img, arithmetic=True)
    hf = J.encode_jpeg(img, arithmetic=False)
    assert len(a) < len(hf)


def test_arith_stream_has_dac_and_no_dht():
    payload = J.encode_jpeg(_gradient_rgb(16, 16), arithmetic=True)
    assert b"\xff\xcc" in payload  # DAC
    assert b"\xff\xc4" not in payload[: payload.index(b"\xff\xda")]  # no DHT
    assert b"\xff\xc9" in payload  # SOF9


def test_arith_multimodal_dispatch():
    """decode_image / media stats route SOF9/SOF10 like any JPEG."""
    rgb = _gradient_rgb(16, 24)
    dec = decode_image(J.encode_jpeg(rgb, arithmetic=True))
    assert dec.shape == rgb.shape


def test_arith_jpeg_through_spark_media_path(spark):
    """The new SOF9/SOF10 decoders must work inside the DISTRIBUTED
    media path (Arrow-batched mapInPandas), not just as local calls:
    a mixed media table of baseline / arithmetic-sequential /
    arithmetic-progressive JPEGs feature-extracts with the real
    decoder, and identical pixels give identical feature vectors
    across entropy codings."""
    import pandas as pd

    from stock_indicators_etl_spark.llmdata.multimodal import (
        extract_media_features,
    )

    rgb = _gradient_rgb(24, 32)
    payloads = {
        1: J.encode_jpeg(rgb),
        2: J.encode_jpeg(rgb, arithmetic=True),
        3: J.encode_jpeg(rgb, arithmetic=True, progressive=True),
    }
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": list(payloads),
                "kind": ["image"] * 3,
                "payload": [bytearray(p) for p in payloads.values()],
                "meta": [None] * 3,
            }
        )
    )
    feats = (
        extract_media_features(media, decoder=real_decoder)
        .orderBy("media_id")
        .collect()
    )
    assert len(feats) == 3
    assert all(len(r["features"]) == FEATURE_DIM for r in feats)
    # same quantized coefficients -> same pixels -> same features
    assert feats[0]["features"] == feats[1]["features"]
    assert feats[0]["features"] == feats[2]["features"]
