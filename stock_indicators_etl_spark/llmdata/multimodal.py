"""Multimodal column plumbing (BASELINE.json north star).

Media travel as opaque ``binary`` columns with typed metadata structs
— the Spark-side contract a 100 TB multimodal pipeline needs: schema,
partitioning, Arrow batch shape, and UDF signatures are real and
tested. Image decode is REAL for PPM/PGM, uncompressed BMP, PNG
(stdlib ``zlib`` inflate + the five byte filters in numpy — every
legal depth 1/2/4/8/16, palette, and Adam7 interlace), sequential
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


def _defilter_rows(
    raw: np.ndarray, nrows: int, rowbytes: int, bpp: int, offset: int = 0
) -> np.ndarray:
    """Invert the five PNG row filters (spec §9: None/Sub/Up/Average/
    Paeth) over BYTES — filtering is defined on the byte stream, so
    this one routine serves every depth (bpp = filter-unit width in
    bytes: ``max(1, channels*depth//8)``). Each scanline is
    ``1 + rowbytes`` bytes, the first byte the filter type. Sub
    inverts as a per-lane cumulative sum; Up as a vectorized add of
    the prior reconstructed row; Average/Paeth walk left→right with
    ``bpp``-wide numpy lanes (their recurrences are inherently
    sequential along the row). Returns (nrows, rowbytes) uint8."""
    stride = 1 + rowbytes
    rows = raw[offset : offset + nrows * stride].reshape(nrows, stride)
    nlanes = rowbytes // bpp
    out = np.zeros((nrows, rowbytes), dtype=np.int64)
    prev = np.zeros(rowbytes, dtype=np.int64)
    for y in range(nrows):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # Sub
            rec = np.cumsum(line.reshape(nlanes, bpp), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average
            rec = np.zeros(rowbytes, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            for x in range(nlanes):
                s = slice(x * bpp, (x + 1) * bpp)
                left = (line[s] + (left + prev[s]) // 2) % 256
                rec[s] = left
        elif f == 4:  # Paeth
            rec = np.zeros(rowbytes, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            ul = np.zeros(bpp, dtype=np.int64)
            for x in range(nlanes):
                s = slice(x * bpp, (x + 1) * bpp)
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
    return out.astype(np.uint8)


def _png_defilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """8-bit-depth convenience wrapper over :func:`_defilter_rows`."""
    return _defilter_rows(raw, h, w * ch, ch).reshape(h, w, ch)


def _png_rowbytes(w: int, channels: int, depth: int) -> int:
    return (w * channels * depth + 7) // 8


def _samples_from_rows(
    rows: np.ndarray, w: int, channels: int, depth: int
) -> np.ndarray:
    """(nrows, rowbytes) defiltered bytes → (nrows, w*channels) sample
    values (uint16-ranged ints for depth 16, raw small ints below 8)."""
    nrows = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].astype(np.int64)
    if depth == 16:
        b = rows[:, : w * channels * 2].reshape(nrows, w * channels, 2)
        return (b[..., 0].astype(np.int64) << 8) | b[..., 1]
    bits = np.unpackbits(rows, axis=1)[:, : w * channels * depth]
    vals = bits.reshape(nrows, w * channels, depth).astype(np.int64)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int64)
    return (vals * weights).sum(axis=2)


#: Adam7 interlace pass grid: (x0, y0, dx, dy) per pass (spec §8.2).
ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode: zlib-inflate the IDAT stream, invert
    the per-row byte filters in numpy, unpack samples at any legal
    bit depth. Supports color types 0 (gray, depths 1/2/4/8/16),
    2 (RGB, 8/16), 3 (palette, 1/2/4/8), 4 (gray+alpha, 8/16),
    6 (RGBA, 8/16), both non-interlaced and Adam7-interlaced.
    Returns (H, W) for gray, else (H, W, channels) uint8 — 16-bit
    samples scale to their high byte, sub-8-bit gray scales to the
    full 0–255 range."""
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
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} not supported")
    legal = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color, (8, 16))
    if depth not in legal:
        raise ValueError(f"illegal PNG depth {depth} for color type {color}")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")

    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    bpp = max(1, channels * depth // 8)
    samples = np.zeros((h, w * channels), dtype=np.int64)
    if interlace == 0:
        rows = _defilter_rows(raw, h, _png_rowbytes(w, channels, depth), bpp)
        samples = _samples_from_rows(rows, w, channels, depth)
    else:  # Adam7: 7 independently-filtered sub-images
        off = 0
        for x0, y0, dx, dy in ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rb = _png_rowbytes(pw, channels, depth)
            rows = _defilter_rows(raw, ph, rb, bpp, offset=off)
            off += ph * (1 + rb)
            sub = _samples_from_rows(rows, pw, channels, depth)
            sub = sub.reshape(ph, pw, channels)
            samples.reshape(h, w, channels)[y0::dy, x0::dx, :] = sub

    img = samples.reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return pal[img.reshape(h, w)]
    if depth == 16:
        img = img >> 8  # high byte, the spec's 16→8 sample rescale
    elif depth < 8:
        # scale e.g. 1-bit {0,1} → {0,255} so histograms are
        # comparable across depth encodings
        img = np.rint(img * (255.0 / ((1 << depth) - 1))).astype(np.int64)
    img = img.astype(np.uint8)
    return img.reshape(h, w) if channels == 1 else img


def _pack_rows(samples: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(nrows, w*channels) sample values → (nrows, rowbytes) scanline
    bytes at ``depth`` (big-endian 16-bit, MSB-first bit packing)."""
    nrows = samples.shape[0]
    rb = _png_rowbytes(w, channels, depth)
    if depth == 8:
        return samples.astype(np.uint8)
    if depth == 16:
        out = np.zeros((nrows, w * channels, 2), dtype=np.uint8)
        out[..., 0] = samples >> 8
        out[..., 1] = samples & 0xFF
        return out.reshape(nrows, rb)
    bits = (
        (samples[..., None] >> np.arange(depth - 1, -1, -1)) & 1
    ).astype(np.uint8).reshape(nrows, -1)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)


def _filter_rows(rows: np.ndarray, bpp: int, row_filters) -> bytearray:
    """Forward-filter scanline bytes (the encoder twin of
    :func:`_defilter_rows`): filter-type byte + filtered bytes per row."""
    nrows, rb = rows.shape
    if row_filters is None:
        row_filters = [0] * nrows
    elif isinstance(row_filters, int):
        row_filters = [row_filters] * nrows
    scan = bytearray()
    prev = np.zeros(rb, dtype=np.int64)
    z = np.zeros(bpp, dtype=np.int64)
    for y in range(nrows):
        f = row_filters[y]
        cur = rows[y].astype(np.int64)
        left = np.concatenate([z, cur[:-bpp]]) if rb > bpp else np.zeros(rb, dtype=np.int64)
        upleft = np.concatenate([z, prev[:-bpp]]) if rb > bpp else np.zeros(rb, dtype=np.int64)
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
    return scan


def encode_png(
    img: np.ndarray,
    row_filters=None,
    depth: int = 8,
    interlace: bool = False,
    palette: np.ndarray | None = None,
) -> bytes:
    """Minimal PNG encoder (stdlib zlib + crc32) — the round-trip
    fixture generator for every :func:`decode_png` branch: gray /
    gray+alpha / RGB / RGBA at depths 8/16, gray at 1/2/4, palette
    (pass ``palette`` (n, 3) and a (H, W) index ``img``) at 1/2/4/8,
    optionally Adam7-``interlace``d. ``row_filters`` (int or per-row
    list, default 0) applies that forward filter to each scanline
    (in interlaced mode, to every pass row)."""
    import zlib

    if palette is not None:
        h, w = img.shape
        ch = 1
        color = 3
    else:
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, ch = img.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        if depth in (1, 2, 4) and color != 0:
            raise ValueError("sub-8-bit depth is gray/palette only")
    a = img.reshape(h, w * ch).astype(np.int64)
    bpp = max(1, ch * depth // 8)

    scan = bytearray()
    if not interlace:
        scan = _filter_rows(_pack_rows(a, w, ch, depth), bpp, row_filters)
    else:
        full = a.reshape(h, w, ch)
        for x0, y0, dx, dy in ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub = full[y0::dy, x0::dx, :].reshape(ph, pw * ch)
            rf = row_filters if row_filters is None or isinstance(row_filters, int) else 0
            scan += _filter_rows(_pack_rows(sub, pw, ch, depth), bpp, rf)

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + typ + data + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, color, 0, 0, 1 if interlace else 0])
    )
    out = PNG_SIG + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(bytes(scan))) + chunk(b"IEND", b"")


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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from .avi import decode_avi

        return decode_avi(payload)[0][0]  # first frame
    raise NotImplementedError(
        "codec-compressed video needs libraries not present in this "
        "environment; PPM/PGM/uncompressed-BMP/PNG/JPEG(SOF0/1/2)/GIF/"
        "uncompressed-AVI decode natively (animation via "
        "gif.sample_gif_frames, video via avi.sample_avi_frames)"
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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        # uncompressed AVI decodes natively — features of frame 0
        return image_decoder(payload, "image")
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


# ---------------------------------------------------------------------------
# header-only metadata probe (no decode)
# ---------------------------------------------------------------------------


def _probe_ppm(p: bytes) -> dict:
    # "P6\n<w> <h>\n<max>\n" with optional '#' comments between tokens
    i, toks = 2, []
    while len(toks) < 3 and i < min(len(p), 4096):
        c = p[i : i + 1]
        if c == b"#":
            while i < len(p) and p[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(p) and not p[j : j + 1].isspace():
                j += 1
            toks.append(p[i:j])
            i = j
    w, h, mx = (int(t) for t in toks)
    return {
        "fmt": "ppm" if p[:2] == b"P6" else "pgm",
        "width": w,
        "height": h,
        "bit_depth": 16 if mx > 255 else 8,
        "n_frames": 1,
    }


def _probe_gif(p: bytes) -> dict:
    w = int.from_bytes(p[6:8], "little")
    h = int.from_bytes(p[8:10], "little")
    flags = p[10]
    i = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
    frames = 0
    # structural block walk — skips sub-block payloads by length, no
    # LZW work at all
    while i < len(p):
        b = p[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(p) and p[i] != 0:
                i += 1 + p[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            frames += 1
            lflags = p[i + 9]
            i += 10 + (3 * (2 << (lflags & 7)) if lflags & 0x80 else 0)
            i += 1  # LZW min code size
            while i < len(p) and p[i] != 0:
                i += 1 + p[i]
            i += 1
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    return {"fmt": "gif", "width": w, "height": h, "bit_depth": 8, "n_frames": frames}


def _probe_jpeg(p: bytes) -> dict:
    i = 2
    while i + 4 <= len(p):
        if p[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = p[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        seglen = int.from_bytes(p[i + 2 : i + 4], "big")
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):  # SOFn
            return {
                "fmt": "jpeg_progressive" if m in (0xC2, 0xCA) else "jpeg",
                "width": int.from_bytes(p[i + 7 : i + 9], "big"),
                "height": int.from_bytes(p[i + 5 : i + 7], "big"),
                "bit_depth": p[i + 4],
                "n_frames": 1,
            }
        i += 2 + seglen
    raise ValueError("JPEG without SOF header")


def _probe_wav(p: bytes) -> dict:
    # RIFF chunk walk for fmt + data (no sample reads)
    i, rate, bits, ch, nbytes = 12, None, None, None, None
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        clen = int.from_bytes(p[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            ch = int.from_bytes(p[i + 10 : i + 12], "little")
            rate = int.from_bytes(p[i + 12 : i + 16], "little")
            bits = int.from_bytes(p[i + 22 : i + 24], "little")
        elif cid == b"data":
            nbytes = clen
        i += 8 + clen + (clen & 1)
    if rate is None or nbytes is None:
        raise ValueError("WAV without fmt/data chunks")
    n_samples = nbytes // max(1, ch * (bits // 8))
    return {
        "fmt": "wav",
        "width": None,
        "height": None,
        "bit_depth": bits,
        "n_frames": n_samples,
        "duration_ms": (n_samples * 1000) // rate if rate else None,
    }


def probe_media_header(payload: bytes) -> dict:
    """Container-header metadata WITHOUT decoding: format, dimensions,
    bit depth, frame count (GIF animations via a structural block
    walk; WAV sample count + duration via the RIFF chunk table). The
    100 TB point of a header probe: filtering a crawl by
    resolution/duration reads a few hundred bytes per object instead
    of decompressing it — run this BEFORE :func:`decode_image` and
    decode only survivors. Unknown/corrupt payloads return
    ``fmt='unknown'`` with null fields rather than raising (a crawl
    batch must not die on one bad object)."""
    out = {
        "fmt": "unknown",
        "width": None,
        "height": None,
        "bit_depth": None,
        "n_frames": None,
        "duration_ms": None,
    }
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            from .avi import probe_avi

            out.update(probe_avi(payload))
        elif payload[:2] in (b"P6", b"P5"):
            out.update(_probe_ppm(payload))
        elif payload[:2] == b"BM":
            out.update(
                {
                    "fmt": "bmp",
                    "width": int.from_bytes(payload[18:22], "little", signed=True),
                    "height": abs(
                        int.from_bytes(payload[22:26], "little", signed=True)
                    ),
                    "bit_depth": int.from_bytes(payload[28:30], "little"),
                    "n_frames": 1,
                }
            )
        elif payload[: len(PNG_SIG)] == PNG_SIG:
            out.update(
                {
                    "fmt": "png",
                    "width": int.from_bytes(payload[16:20], "big"),
                    "height": int.from_bytes(payload[20:24], "big"),
                    "bit_depth": payload[24],
                    "n_frames": 1,
                }
            )
        elif payload[:2] == b"\xff\xd8":
            out.update(_probe_jpeg(payload))
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            out.update(_probe_gif(payload))
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            out.update(_probe_wav(payload))
    except (ValueError, IndexError):
        return {
            "fmt": "unknown",
            "width": None,
            "height": None,
            "bit_depth": None,
            "n_frames": None,
            "duration_ms": None,
        }
    return out


MEDIA_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("bit_depth", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def media_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched header probe over an opaque binary column —
    scan-local (zero shuffles), constant work per object regardless
    of payload size."""

    def run(batches):
        for b in batches:
            rows = [probe_media_header(bytes(p)) for p in b[payload_col]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", b["media_id"].to_numpy())
            yield out

    return media.mapInPandas(run, schema=MEDIA_HEADER_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual-hash (dHash) image near-dup
# ---------------------------------------------------------------------------

#: dHash grid: 9 columns x 8 rows of pixels -> 8x8 = 64 difference bits.
DHASH_COLS = 9
DHASH_ROWS = 8
DHASH_MAX_HAMMING = 6

_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("b0", T.LongType()),
        T.StructField("b1", T.LongType()),
        T.StructField("b2", T.LongType()),
        T.StructField("b3", T.LongType()),
        T.StructField("dhash_hex", T.StringType()),
    ]
)


def _doc_cell_bytes(text_col: str) -> "F.Column":
    """The 72 deterministic grayscale cell bytes of a document's
    9×8 'rendering': cell i = first md5 byte of ``word[i]`` for
    i < n_words, else of the position-keyed padding ``'#' || i`` —
    strictly POSITIONAL, so an edit to one word changes exactly one
    cell (≤2 dHash bits) and an append touches only the cells it
    occupies: the locality property a PERCEPTUAL hash needs (a
    modulo-wrapped layout would re-key every cell whenever the word
    count changes). Engine-exact: md5 + integer ops only."""
    from stock_indicators_etl_spark.llmdata.text import words

    w = words(F.col(text_col))
    n = F.size(w)
    return F.transform(
        F.sequence(F.lit(0), F.lit(DHASH_COLS * DHASH_ROWS - 1)),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.when(
                        i < n, F.element_at(w, i + F.lit(1))
                    ).otherwise(F.concat(F.lit("#"), i.cast("string")))
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("int"),
    )


def doc_image_dhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document 64-bit dHash, THROUGH the real image codec: the
    cell bytes become an actual 8×9 grayscale PNG (``encode_png``),
    which is then decoded back (``decode_image``) and difference-
    hashed — the Spark-side plumbing a crawl-image dedup runs, with
    the library's own codecs standing in for the decoder. Returns
    ``(doc_id, b0..b3, dhash_hex)`` — the four 16-bit hash bands
    (BIGINT-safe) plus the 16-hex-char hash.

    The SQL oracle computes the same bits directly from the cell
    bytes — legitimate because encode→decode is pixel-identical
    (pinned by the PNG round-trip tests), so the codec leg is an
    identity the oracle may skip.

    Scale: cell synthesis is scan-local HOFs; the codec leg is one
    Arrow-batched ``mapInPandas`` with constant work per doc; no
    shuffle anywhere."""
    from stock_indicators_etl_spark.llmdata.text import spread

    pre = spread(docs).select(
        "doc_id", _doc_cell_bytes(text_col).alias("_cells")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, cells in zip(b["doc_id"], b["_cells"]):
                px = np.asarray(list(cells), dtype=np.uint8).reshape(
                    DHASH_ROWS, DHASH_COLS
                )
                png = encode_png(px)
                back = decode_image(png)
                if back.ndim == 3:
                    back = back[:, :, 0]
                assert (back == px).all(), "PNG round-trip must be exact"
                bits = (
                    back[:, :-1] < back[:, 1:]
                ).astype(np.uint64).reshape(-1)  # 64 bits, row-major
                bands = []
                for k in range(4):
                    word = 0
                    for j in range(16):
                        word = (word << 1) | int(bits[k * 16 + j])
                    bands.append(word)
                hex64 = "".join(f"{w:04x}" for w in bands)
                rows.append(
                    (int(doc_id), bands[0], bands[1], bands[2], bands[3], hex64)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3", "dhash_hex"]
            )

    return pre.mapInPandas(run, schema=_DHASH_SCHEMA)


def dhash_neardup(
    hashes: DataFrame, max_hamming: int = DHASH_MAX_HAMMING
) -> DataFrame:
    """Near-duplicate image pairs by dHash Hamming distance: band the
    64-bit hash into four 16-bit words — by pigeonhole a pair within
    distance 3 ALWAYS shares an untouched band (guaranteed recall);
    at the default radius 6 recall is the standard banded-LSH
    heuristic (differences clustering in ≤3 bands still collide) —
    equi-join per band, and verify AT THE BAND JOIN from the carried
    band words (``bit_count(xor)`` per band — the r9
    score-where-co-located pattern; a hash is 4 small ints, so
    carrying it through the banded stream is ~free). Emits
    ``(doc_a, doc_b, hamming)``, deduped across bands."""
    bands = hashes.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"), F.col(f"b{k}").alias("band")
                    )
                    for k in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "b0", "b1", "b2", "b3", "bk.k", "bk.band")
    left = bands.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
        "k",
        "band",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
        "k",
        "band",
    )
    ham = sum(
        F.bit_count(
            F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}"))
        )
        for k in range(4)
    )
    return (
        left.join(right.hint("merge"), ["k", "band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
