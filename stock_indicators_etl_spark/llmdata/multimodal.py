"""Multimodal column plumbing (BASELINE.json north star).

Media travel as opaque ``binary`` columns with typed metadata structs
— the Spark-side contract a 100 TB multimodal pipeline needs: schema,
partitioning, Arrow batch shape, and UDF signatures are real and
tested; the *decode* kernels (image/audio libs are not in this
container) are stubbed behind ``decoder=`` injection with a
deterministic fake, and raise ``NotImplementedError`` when a real
decode is requested.

Scale notes: ``mapInPandas`` streams Arrow batches → bounded memory
per task regardless of blob sizes; keep blobs ≤ a few MB per row
(chunk larger media across rows) and set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for fat rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
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

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

Decoder = Callable[[bytes, str], np.ndarray]


def fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic decode stand-in: FEATURE_DIM floats derived from
    a byte histogram — stable across runs/engines, no media libs."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return (hist / max(len(arr), 1)).astype(np.float32)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of binary PPM/PGM (P6/P5, maxval ≤ 255) to a
    (H, W, 3) / (H, W) uint8 array — real pixel decoding, no codec
    libs (the formats are uncompressed header + raw bytes)."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header tokens: magic, width, height, maxval; '#' comments legal
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    i += 1  # single whitespace after maxval
    ch = 3 if payload[:2] == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    return arr.reshape((h, w, 3)) if ch == 3 else arr.reshape((h, w))


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of uncompressed 24-bit BMP (BI_RGB) to
    (H, W, 3) uint8 RGB — handles the bottom-up row order and 4-byte
    row padding the format mandates."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if flipped else img


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes: PPM/PGM and uncompressed BMP decode
    for real (pure numpy); compressed formats (PNG/JPEG/…) raise —
    those genuinely need codec libs this container lacks."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "compressed image formats need codec libraries not present in this "
        "environment; PPM/PGM/uncompressed-BMP decode natively"
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 → binary PPM/PGM bytes."""
    if img.ndim == 3:
        h, w, _ = img.shape
        return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def image_decoder(payload: bytes, kind: str) -> np.ndarray:
    """REAL feature extractor for decodable images: decode to pixels,
    then a FEATURE_DIM-bin normalized luminance histogram (ITU-R 601
    weights). Same signature/shape as :func:`fake_decoder`, so it
    drops into :func:`extract_media_features` unchanged."""
    img = decode_image(payload)
    if img.ndim == 3:
        lum = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        )
    else:
        lum = img.astype(np.float64)
    hist, _ = np.histogram(lum, bins=FEATURE_DIM, range=(0, 256))
    return (hist / max(lum.size, 1)).astype(np.float32)


def image_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for decodable images: decode →
    index-sample rows/cols → re-encode PPM/PGM. Same signature as
    :func:`fake_resize` (drops into :func:`resize_media`)."""
    img = decode_image(payload)
    h, w = img.shape[:2]
    ri = (np.arange(height) * h) // height
    ci = (np.arange(width) * w) // width
    return encode_ppm(img[ri][:, ci])


def real_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Codec-library decode path for COMPRESSED formats — PIL/av/
    librosa are not present here. Decodable uncompressed images go
    through :func:`image_decoder` for real."""
    if kind == "image" and payload[:2] in (b"P6", b"P5", b"BM"):
        return image_decoder(payload, kind)
    raise NotImplementedError(
        "media decode libraries are not available in this environment; "
        "inject a decoder, or use image_decoder for PPM/PGM/BMP payloads"
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from ``documents`` (no binary test
    data ships with the driver): payload = utf-8 text bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(0).alias("duration_ms"),
        ).alias("meta"),
    )


def extract_media_features(
    media: DataFrame, decoder: Decoder = fake_decoder
) -> DataFrame:
    """Decode / feature-extract media payloads via Arrow-batched
    ``mapInPandas`` (schema-stable regardless of decoder)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for payload, kind in zip(b["payload"], b["kind"]):
                raw = bytes(payload) if payload is not None else b""
                feats.append(
                    {
                        "n_bytes": len(raw),
                        "sha256": hashlib.sha256(raw).hexdigest(),
                        "features": decoder(raw, kind).tolist(),
                    }
                )
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", b["media_id"].values)
            out.insert(1, "kind", b["kind"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: nearest-neighbor over the raw
    byte stream to exactly width·height bytes (a real PIL resize slots
    into the same signature)."""
    target = width * height
    if not payload or target == 0:
        return b"\x00" * target
    arr = np.frombuffer(payload, dtype=np.uint8)
    idx = (np.arange(target) * len(arr)) // target
    return arr[idx].tobytes()


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Resize every payload to (width, height) via Arrow-batched
    ``mapInPandas``. Plumbing is real (schema, batch shape, binary
    round-trip); the default kernel is the deterministic stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = pd.DataFrame(
                {
                    "media_id": b["media_id"].values,
                    "kind": b["kind"].values,
                    "payload": [
                        resizer(bytes(p) if p is not None else b"", width, height)
                        for p in b["payload"]
                    ],
                }
            )
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    frame_bytes: int = 64,
    max_frames: int = 16,
) -> DataFrame:
    """Frame-sampling plumbing: one media row fans out to ≤max_frames
    frame rows at every_ms spacing (a real video demuxer slots in; the
    stub slices the payload evenly). The 1→N row expansion inside
    ``mapInPandas`` is the shape a real frame extractor needs — output
    cardinality independent of input batch boundaries."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload, meta in zip(b["media_id"], b["payload"], b["meta"]):
                raw = bytes(payload) if payload is not None else b""
                dur = int(meta["duration_ms"]) if meta is not None else 0
                n = min(max_frames, max(dur // every_ms, 1) if raw else 0)
                for i in range(n):
                    lo = (i * len(raw)) // max(n, 1)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame": raw[lo : lo + frame_bytes],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-SQL metadata stats (no decode): portable oracle surface."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )
