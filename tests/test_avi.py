"""Uncompressed-AVI demux/decode/frame-sampling tests."""

from __future__ import annotations

import numpy as np
import pytest


def _frames(n, h=13, w=9, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


class TestAviRoundTrip:
    def test_pixel_identity(self):
        from stock_indicators_etl_spark.llmdata.avi import decode_avi, encode_avi

        frames = _frames(4)
        out, usec = decode_avi(encode_avi(frames, usec_per_frame=50_000))
        assert usec == 50_000 and len(out) == 4
        for a, b in zip(frames, out):
            assert (a == b).all()

    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 16])
    def test_row_padding_widths(self, w):
        # DIB rows pad to 4 bytes; every width mod-4 class must survive
        from stock_indicators_etl_spark.llmdata.avi import decode_avi, encode_avi

        frames = _frames(2, h=5, w=w, seed=w)
        out, _ = decode_avi(encode_avi(frames))
        for a, b in zip(frames, out):
            assert (a == b).all()

    def test_single_frame_default_fps(self):
        from stock_indicators_etl_spark.llmdata.avi import decode_avi, encode_avi

        out, usec = decode_avi(encode_avi(_frames(1)))
        assert len(out) == 1 and usec == 40_000

    def test_non_avi_raises(self):
        from stock_indicators_etl_spark.llmdata.avi import AviError, decode_avi

        with pytest.raises(AviError):
            decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
        with pytest.raises(AviError):
            decode_avi(b"nonsense")

    def test_compressed_chunk_raises_honestly(self):
        from stock_indicators_etl_spark.llmdata.avi import decode_avi, encode_avi

        payload = bytearray(encode_avi(_frames(2)))
        # flip the first movi frame fourcc 00db -> 00dc (compressed)
        i = payload.find(b"00db")
        payload[i : i + 4] = b"00dc"
        with pytest.raises(NotImplementedError, match="codec"):
            decode_avi(bytes(payload))

    def test_truncated_tail_drops_partial_frame(self):
        # a crawl-truncated tail must not crash the demux: the partial
        # trailing chunk is skipped (a batch must not die on one bad
        # object), earlier complete frames survive
        from stock_indicators_etl_spark.llmdata.avi import decode_avi, encode_avi

        frames = _frames(3, h=8, w=8)
        payload = encode_avi(frames)
        out, _ = decode_avi(payload[:-40])
        assert len(out) == 2
        for a, b in zip(frames, out):
            assert (a == b).all()

    def test_short_frame_chunk_raises(self):
        from stock_indicators_etl_spark.llmdata.avi import (
            AviError,
            decode_avi,
            encode_avi,
        )

        payload = bytearray(encode_avi(_frames(1, h=8, w=8)))
        i = payload.find(b"00db")
        # shrink the declared chunk size below one raster, keep it
        # in-bounds so the walk yields it
        payload[i + 4 : i + 8] = (10).to_bytes(4, "little")
        with pytest.raises(AviError, match="raster"):
            decode_avi(bytes(payload))


class TestAviDispatch:
    def test_decode_image_first_frame(self):
        from stock_indicators_etl_spark.llmdata.avi import encode_avi
        from stock_indicators_etl_spark.llmdata.multimodal import decode_image

        frames = _frames(3)
        assert (decode_image(encode_avi(frames)) == frames[0]).all()

    def test_probe_header_fields(self):
        from stock_indicators_etl_spark.llmdata.avi import encode_avi
        from stock_indicators_etl_spark.llmdata.multimodal import (
            probe_media_header,
        )

        p = probe_media_header(encode_avi(_frames(5), usec_per_frame=20_000))
        assert p["fmt"] == "avi" and p["n_frames"] == 5
        assert (p["width"], p["height"], p["bit_depth"]) == (9, 13, 24)
        assert p["duration_ms"] == 100

    def test_real_decoder_features_frame0(self):
        from stock_indicators_etl_spark.llmdata.avi import encode_avi
        from stock_indicators_etl_spark.llmdata.multimodal import (
            image_decoder,
            real_decoder,
        )

        frames = _frames(2)
        payload = encode_avi(frames)
        got = real_decoder(payload, "video")
        want = image_decoder(payload, "image")
        assert (got == want).all() and got.shape == want.shape

    def test_wav_probe_unaffected(self):
        # the RIFF dispatch must not swallow WAVE payloads
        from stock_indicators_etl_spark.llmdata.audio import encode_wav
        from stock_indicators_etl_spark.llmdata.multimodal import (
            probe_media_header,
        )

        wav = encode_wav(np.zeros(100, dtype=np.int16), sample_rate=8000)
        assert probe_media_header(wav)["fmt"] == "wav"


class TestAviSampling:
    def test_spark_frame_sampling_parity(self, spark):
        from stock_indicators_etl_spark.llmdata.avi import (
            encode_avi,
            sample_avi_frames,
        )
        from stock_indicators_etl_spark.llmdata.multimodal import decode_image

        frames = _frames(10, seed=3)
        payload = encode_avi(frames, usec_per_frame=100_000)  # 100 ms/frame
        media = spark.createDataFrame(
            [(1, bytearray(payload))], "media_id long, payload binary"
        )
        out = sample_avi_frames(media, every_ms=250, max_frames=4).collect()
        assert [r["ts_ms"] for r in out] == [0, 250, 500, 750]
        assert [r["frame_idx"] for r in out] == [0, 1, 2, 3]
        # ts 250 falls in frame 2 (frames span [200,300) ms)
        got = decode_image(bytes(out[1]["frame"]))
        assert (got == frames[2]).all()
        assert out[0]["width"] == 9 and out[0]["height"] == 13

    def test_sampler_caps_frames(self, spark):
        from stock_indicators_etl_spark.llmdata.avi import (
            encode_avi,
            sample_avi_frames,
        )

        payload = encode_avi(_frames(30), usec_per_frame=10_000)
        media = spark.createDataFrame(
            [(1, bytearray(payload))], "media_id long, payload binary"
        )
        out = sample_avi_frames(media, every_ms=10, max_frames=5).collect()
        assert len(out) == 5


class TestMjpegAvi:
    def test_mjpeg_parity_with_jpeg_path(self):
        # JPEG is lossy: the pin is exact parity with the repo's own
        # T.81 decode of the same per-frame JFIF bytes
        from stock_indicators_etl_spark.llmdata.avi import decode_avi, encode_avi
        from stock_indicators_etl_spark.llmdata.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        frames = _frames(3, h=16, w=24, seed=5)
        out, usec = decode_avi(
            encode_avi(frames, usec_per_frame=50_000, mjpeg=True)
        )
        assert len(out) == 3 and usec == 50_000
        for fr, got in zip(frames, out):
            assert (got == decode_jpeg(encode_jpeg(fr, quality=90))).all()

    def test_mjpeg_quality_close_to_source(self):
        from stock_indicators_etl_spark.llmdata.avi import decode_avi, encode_avi

        # smooth gradient survives JPEG at q=90 within a few levels
        g = np.tile(np.arange(64, dtype=np.uint8), (16, 1))
        fr = np.stack([g, g, g], axis=2)
        out, _ = decode_avi(encode_avi([fr], mjpeg=True, quality=90))
        assert np.mean(np.abs(out[0].astype(int) - fr.astype(int))) < 4.0

    def test_mjpeg_sampling_through_spark(self, spark):
        from stock_indicators_etl_spark.llmdata.avi import (
            encode_avi,
            sample_avi_frames,
        )

        payload = encode_avi(_frames(6, seed=9), usec_per_frame=100_000, mjpeg=True)
        media = spark.createDataFrame(
            [(1, bytearray(payload))], "media_id long, payload binary"
        )
        out = sample_avi_frames(media, every_ms=200, max_frames=3).collect()
        assert [r["ts_ms"] for r in out] == [0, 200, 400]

    def test_unknown_codec_still_raises(self):
        from stock_indicators_etl_spark.llmdata.avi import decode_avi, encode_avi

        payload = bytearray(encode_avi(_frames(1), mjpeg=True))
        i = payload.find(b"MJPG")
        payload[i : i + 4] = b"H264"
        with pytest.raises(NotImplementedError, match="inject"):
            decode_avi(bytes(payload))
