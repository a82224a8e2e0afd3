"""GIF87a/89a decode in pure numpy + stdlib — including animation.

North-star multimodal surface (reference N/A). GIF is LZW + palettes,
both implementable from the public spec with no codec libraries: this
module decodes the logical screen, global/local color tables,
variable-width LZW image data, interlacing, and composes animation
frames (disposal methods none/keep/restore-background, transparency
via the GCE transparent index). With this, ``sample_gif_frames``
turns the frame-sampling plumbing of ``multimodal.sample_frames``
into REAL frame extraction for animated media — actual pixel frames
at actual timestamps, emitted as PPM bytes so every downstream image
operator (features, resize) applies per frame.

The encoder exists to generate fixtures (it builds the same LZW
dictionary the decoder does) so every branch round-trips:
gray/palette images, interlace, multi-frame animations with
transparency and per-frame delays.

Scale: decode runs inside the same Arrow-batched ``mapInPandas``
plumbing as every media kernel; one clip row fans out to ≤max_frames
narrow frame rows, never shuffling decoded pixels.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: variable code width starting at
    min_code_size+1, CLEAR resets the dictionary, codes cap at 12
    bits."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    # bit reader, LSB-first per the GIF spec
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    prev: list[int] | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + [entry[0]])
        else:  # the KwKwK case
            entry = prev + [prev[0]]
            table.append(entry)
        out.extend(entry)
        if prev is not None and len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Mirror encoder (fixture generator): builds the same dictionary."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run: tuple[int, ...] = ()
    for sym in indices:
        cand = run + (sym,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = (sym,)
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes → ``(frames, delays_ms)``: frames is (n, H, W, 3)
    uint8 RGB composed per the animation disposal rules; delays in
    ms (0 for still images)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n

    frames: list[np.ndarray] = []
    delays: list[int] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[bg]
    transparent: int | None = None
    delay_ms = 0
    disposal = 0

    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[i + 1]
            i += 2
            if label == 0xF9:  # graphics control
                sz = payload[i]
                gflags, delay, tidx = struct.unpack(
                    "<BHB", payload[i + 1 : i + 5]
                )
                disposal = (gflags >> 2) & 7
                transparent = tidx if gflags & 1 else None
                delay_ms = delay * 10
                i += 1 + sz
            while payload[i] != 0:  # skip (remaining) sub-blocks
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            left, top, iw, ih, iflags = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
            i += 10
            lct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                lct = np.frombuffer(
                    payload[i : i + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                i += 3 * n
            if lct is None:
                raise ValueError("GIF image with no color table")
            min_code = payload[i]
            i += 1
            blocks = bytearray()
            while payload[i] != 0:
                sz = payload[i]
                blocks += payload[i + 1 : i + 1 + sz]
                i += 1 + sz
            i += 1
            idx = np.array(
                _lzw_decode(bytes(blocks), min_code)[: iw * ih], dtype=np.int64
            ).reshape(ih, iw)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            prev_canvas = canvas.copy()
            patch = lct[np.clip(idx, 0, len(lct) - 1)]
            region = canvas[top : top + ih, left : left + iw]
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, patch, region)
            else:
                region[:] = patch
            frames.append(canvas.copy())
            delays.append(delay_ms)
            if disposal == 2:  # restore to background
                canvas = prev_canvas.copy()
                canvas[top : top + ih, left : left + iw] = (
                    gct[bg] if gct is not None else 0
                )
            elif disposal == 3:  # restore to previous
                canvas = prev_canvas
            # disposal 0/1: leave as drawn
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    delays_ms: list[int] | None = None,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """Fixture encoder: ``frames`` is (n, H, W) palette indices,
    ``palette`` (k≤256, 3) uint8. Animations get GCE blocks with the
    given delays; ``transparent`` marks that index transparent in
    frames after the first."""
    frames = np.asarray(frames)
    if frames.ndim == 2:
        frames = frames[None]
    n_frames, h, w = frames.shape
    k = len(palette)
    bits = max(1, int(np.ceil(np.log2(max(k, 2)))))
    size_field = bits - 1
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:k] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal.tobytes()
    min_code = max(bits, 2)
    for fi in range(n_frames):
        if delays_ms is not None:
            gflags = 0
            tidx = 0
            if transparent is not None and fi > 0:
                gflags |= 1
                tidx = transparent
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", gflags, delays_ms[fi] // 10, tidx
            ) + b"\x00"
        iflags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        rows = frames[fi]
        if interlace:
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, h, step)
            ]
            rows = rows[order]
        out.append(min_code)
        data = _lzw_encode([int(v) for v in rows.reshape(-1)], min_code)
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# DataFrame operator: REAL frame sampling
# ---------------------------------------------------------------------------

GIF_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),  # PPM bytes
    ]
)


def sample_gif_frames(
    media: DataFrame, every_ms: int = 100, max_frames: int = 16
) -> DataFrame:
    """REAL frame extraction for animated GIF payloads: decode the
    animation, emit the composed frame nearest each ``every_ms``
    timestamp (≤ max_frames), as PPM bytes ready for
    ``image_decoder``/``image_resize``. Same 1→N ``mapInPandas``
    contract as :func:`multimodal.sample_frames` — but the frames are
    actual pixels, not byte slices."""
    from .multimodal import encode_ppm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                frames, delays = decode_gif(bytes(payload))
                ts = np.cumsum([0] + delays[:-1])
                total = ts[-1] + (delays[-1] if delays else 0)
                wanted = range(0, max(int(total), 1), every_ms)
                picked = []
                for t in wanted:
                    fi = int(np.searchsorted(ts, t, side="right") - 1)
                    picked.append((t, fi))
                    if len(picked) >= max_frames:
                        break
                if not picked:
                    picked = [(0, 0)]
                for k, (t, fi) in enumerate(picked):
                    fr = frames[fi]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": k,
                            "ts_ms": int(t),
                            "width": int(fr.shape[1]),
                            "height": int(fr.shape[0]),
                            "frame": encode_ppm(fr),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in GIF_FRAMES_SCHEMA.fields],
            )

    return media.mapInPandas(run, schema=GIF_FRAMES_SCHEMA)
