"""Worked decoder-injection example for compressed media.

``llmdata.multimodal.real_decoder`` honestly raises
``NotImplementedError`` for video containers and compressed audio —
the codec libraries (PyAV / ffmpeg / librosa) are absent in this
environment. This example shows the documented escape hatch: the
``decoder=`` parameter of :func:`extract_media_features` accepts ANY
callable matching the contract

    decoder(payload: bytes, kind: str) -> np.ndarray   # 1-D float

so a deployment WITH codec libraries injects its own decode without
touching the Spark plumbing (schema, Arrow batching, partitioning all
stay as tested). The pattern:

1. write a codec adapter that recognizes its container's magic bytes,
   decodes frames/samples with the external library, and reduces them
   to the pipeline's fixed-width feature vector;
2. fall through to :func:`real_decoder` for everything the built-in
   pure-numpy decoders already handle (PPM/PGM/BMP/PNG/baseline
   JPEG/GIF/WAV-PCM);
3. pass the adapter as ``decoder=``.

The "codec" below is a STUB standing in for the external library: a
deterministic toy container (``XVID`` magic + frame count + per-frame
gray bytes) that exercises the exact same adapter seams a PyAV-backed
MP4 decoder would use (demux → per-frame decode → temporal sample →
spatial reduce). ``tests/test_sources_streaming.py`` runs this module
end-to-end.
"""

from __future__ import annotations

import numpy as np

from stock_indicators_etl_spark.llmdata.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    real_decoder,
)

#: toy container magic — stands in for e.g. b"....ftyp" (MP4).
STUB_MAGIC = b"XVID"


def encode_stub_video(frames: list[np.ndarray]) -> bytes:
    """Build a toy 'compressed video' payload: magic, frame count,
    per-frame (h, w, gray bytes). Only the tests/fixtures use this —
    a real deployment's payloads come from the crawl."""
    out = [STUB_MAGIC, len(frames).to_bytes(2, "big")]
    for f in frames:
        h, w = f.shape
        out += [h.to_bytes(2, "big"), w.to_bytes(2, "big"),
                f.astype(np.uint8).tobytes()]
    return b"".join(out)


def _stub_codec_decode(payload: bytes) -> list[np.ndarray]:
    """The stand-in for the external codec library call
    (``av.open(...)``/``ffmpeg``): demux + decode every frame."""
    n = int.from_bytes(payload[4:6], "big")
    frames, off = [], 6
    for _ in range(n):
        h = int.from_bytes(payload[off : off + 2], "big")
        w = int.from_bytes(payload[off + 2 : off + 4], "big")
        off += 4
        frames.append(
            np.frombuffer(payload[off : off + h * w], dtype=np.uint8).reshape(h, w)
        )
        off += h * w
    return frames


def video_decoder(payload: bytes, kind: str) -> np.ndarray:
    """The injection adapter. Contract: (payload, kind) -> 1-D float
    feature vector; unknown formats fall through to the built-in
    :func:`real_decoder` so one adapter serves a mixed-media column."""
    if payload[: len(STUB_MAGIC)] == STUB_MAGIC:
        frames = _stub_codec_decode(payload)
        # temporal sampling: first / middle / last frame (same policy
        # as gif.sample_gif_frames), then a FEATURE_DIM luminance
        # histogram over the sampled frames
        idx = sorted({0, len(frames) // 2, len(frames) - 1})
        lum = np.concatenate([frames[i].ravel() for i in idx]).astype(np.float64)
        hist, _ = np.histogram(lum, bins=FEATURE_DIM, range=(0, 256))
        return (hist / max(lum.size, 1)).astype(np.float32)
    return real_decoder(payload, kind)


def run_example(spark, media_df=None):
    """Feature-extract a media frame with the injected codec. Returns
    the features DataFrame (same FEATURES_SCHEMA as every decoder).

    Ships THIS module to the executors first (``addPyFile``) — the
    injected adapter is pickled by reference, so on a real cluster the
    module must be importable worker-side; the same line works there.
    """
    spark.sparkContext.addPyFile(__file__)
    if media_df is None:
        from pyspark.sql import functions as F

        rng = np.random.default_rng(5)
        payload = encode_stub_video(
            [rng.integers(0, 256, (8, 8)).astype(np.uint8) for _ in range(5)]
        )
        media_df = spark.createDataFrame(
            [(1, "video", bytearray(payload))], "media_id long, kind string, payload binary"
        ).withColumn("meta", F.lit(None).cast("string"))
    return extract_media_features(media_df, decoder=video_decoder)
