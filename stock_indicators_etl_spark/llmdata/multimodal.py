"""Multimodal column plumbing (BASELINE.json north star).

Media travel as opaque ``binary`` columns with typed metadata structs
— the Spark-side contract a 100 TB multimodal pipeline needs: schema,
partitioning, Arrow batch shape, and UDF signatures are real and
tested. Image decode is REAL for PPM/PGM, uncompressed BMP, PNG
(stdlib ``zlib`` inflate + the five row filters in numpy), sequential
AND progressive JPEG (pure-numpy Huffman + IDCT + SOF2 multi-scan
coefficient accumulation, ``llmdata/jpeg.py``), and GIF —
including animation frame extraction (``llmdata/gif.py``); audio
decode is REAL for RIFF/WAVE PCM (``llmdata/audio.py``).
Video-container and compressed-audio codecs genuinely need libraries
this container lacks, so those paths stay behind ``decoder=``
injection with a deterministic fake and raise
``NotImplementedError`` when a real codec decode is requested.

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
    if maxval != 255:
        # normalize to full 8-bit range so downstream histograms are
        # comparable across maxval encodings (ADVICE r5)
        arr = np.rint(arr.astype(np.float64) * (255.0 / maxval)).astype(np.uint8)
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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Iterate (type, data) over PNG chunks; stops at IEND."""
    i = len(PNG_SIG)
    while i + 8 <= len(payload):
        ln = int.from_bytes(payload[i : i + 4], "big")
        typ = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        yield typ, data
        if typ == b"IEND":
            return
        i += 12 + ln  # length + type + data + crc


def _png_defilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Invert the five PNG row filters (spec §9: None/Sub/Up/Average/
    Paeth). Each scanline is ``1 + w*ch`` bytes, the first byte the
    filter type. Sub inverts as a per-lane cumulative sum; Up as a
    vectorized add of the prior reconstructed row; Average/Paeth walk
    pixels left→right with ``ch``-wide numpy lanes (their recurrences
    are inherently sequential along the row)."""
    stride = 1 + w * ch
    rows = raw[: h * stride].reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.int64)
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # Sub
            rec = np.cumsum(line.reshape(w, ch), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average
            rec = np.zeros(w * ch, dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = (line[s] + (left + prev[s]) // 2) % 256
                rec[s] = left
        elif f == 4:  # Paeth
            rec = np.zeros(w * ch, dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            ul = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                up = prev[s]
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                left = (line[s] + pred) % 256
                rec[s] = left
                ul = up
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, w, ch)


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode: zlib-inflate the IDAT stream, invert
    the per-row filters in numpy. Supports 8-bit depth, color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
    non-interlaced — the common corpus-image shapes. Returns (H, W)
    for gray, else (H, W, channels) uint8."""
    import zlib

    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = b""
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, _comp, _filt, interlace = ihdr[8:13]
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG supported")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} not supported")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    img = _png_defilter(raw, h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return pal[img.reshape(h, w)]
    return img.reshape(h, w) if channels == 1 else img


def encode_png(img: np.ndarray, row_filters=None) -> bytes:
    """Minimal PNG encoder (stdlib zlib + crc32): 8-bit gray / gray+
    alpha / RGB / RGBA, non-interlaced. ``row_filters`` (int or per-row
    list, default 0) applies that forward filter to each scanline — the
    round-trip fixture generator for every :func:`decode_png` filter
    branch."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if row_filters is None:
        row_filters = [0] * h
    elif isinstance(row_filters, int):
        row_filters = [row_filters] * h
    a = img.astype(np.int64)
    flat = a.reshape(h, w * ch)
    scan = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        f = row_filters[y]
        cur = flat[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]]) if w * ch > ch else np.zeros(w * ch, dtype=np.int64)
        upleft = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]]) if w * ch > ch else np.zeros(w * ch, dtype=np.int64)
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - left) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            filt = (cur - (left + prev) // 2) % 256
        elif f == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (cur - pred) % 256
        else:
            raise ValueError(f"bad filter {f}")
        scan.append(f)
        scan.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + typ + data + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color, 0, 0, 0])
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes: PPM/PGM, uncompressed BMP, PNG (stdlib
    zlib inflate + numpy defilter), and sequential+progressive JPEG (pure-numpy
    Huffman + IDCT, see ``llmdata/jpeg.py``) decode for real; video
    raises — containers/codecs genuinely need libs absent here."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)[0][0]  # first frame
    raise NotImplementedError(
        "video-container decode needs codec libraries not present in "
        "this environment; PPM/PGM/uncompressed-BMP/PNG/JPEG(SOF0/1/2)/"
        "GIF decode natively (animated GIF via gif.sample_gif_frames)"
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
    if img.ndim == 3 and img.shape[2] >= 3:  # RGB / RGBA (alpha ignored)
        lum = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        )
    elif img.ndim == 3:  # gray+alpha
        lum = img[..., 0].astype(np.float64)
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
    """Codec-library decode path for formats needing external codecs —
    video/compressed audio (PIL/av/librosa are not present here).
    Decodable images (PPM/PGM/BMP/PNG/sequential+progressive JPEG) go through
    :func:`image_decoder` and RIFF/WAVE PCM through
    :func:`audio.audio_decoder` for real."""
    if kind == "image" and (
        payload[:2] in (b"P6", b"P5", b"BM", b"\xff\xd8")
        or payload[: len(PNG_SIG)] == PNG_SIG
        or payload[:6] in (b"GIF87a", b"GIF89a")
    ):
        return image_decoder(payload, kind)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from .audio import audio_decoder

        return audio_decoder(payload, kind)
    raise NotImplementedError(
        "video/compressed-audio decode libraries are not available "
        "in this environment; inject a decoder (worked example: "
        "examples/custom_codec_injection.py), or use image_decoder "
        "(PPM/PGM/BMP/PNG/JPEG incl. progressive) / audio.audio_decoder "
        "(WAV PCM) payloads"
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
