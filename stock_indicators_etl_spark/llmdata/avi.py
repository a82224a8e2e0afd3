"""Pure-python uncompressed-AVI (RIFF ``AVI ``) demux + decode.

Makes the VIDEO frame-sampling leg real end-to-end the way
``gif.py`` did for animation: the container walk (RIFF LIST tree,
``hdrl`` headers, ``movi`` frame chunks) and the frame decode are
implemented here for the two video formats this repo can decode with
its own mathematics:

- DIB/BI_RGB (``biCompression = 0``) — 24-bit bottom-up BGR rows
  padded to 4 bytes inside ``00db`` chunks (the uncompressed-BMP
  raster layout, re-derived from the public RIFF/AVI and
  BITMAPINFOHEADER layouts);
- MJPEG (``biCompression = 'MJPG'``) — one standalone JFIF image per
  ``00dc`` chunk, decoded by the repo's own pure-numpy ITU-T T.81
  decoder (``llmdata/jpeg.py``) — a genuinely compressed video leg
  with no external codec library.

Other codecs (H.264/VP9/...) still raise honestly with the tested
``decoder=`` injection escape hatch
(``examples/custom_codec_injection.py``).

Reference: N/A (the reference repo is a pandas indicator ETL with no
media surface; this is §"multimodal columns" of the extension
brief — decode/frame-sample as real plumbing).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_U32 = "little"


def _u32(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 4], _U32)


def _walk_chunks(buf: bytes, off: int, end: int):
    """Yield (fourcc, payload_offset, payload_size) with RIFF's
    2-byte alignment rule. A crawl-truncated tail must not kill the
    demux: a truncated CONTAINER (LIST) is clamped to the available
    bytes so the complete children inside it still parse; a truncated
    LEAF chunk is dropped (a partial frame raster is useless)."""
    while off + 8 <= end:
        fcc = buf[off : off + 4]
        size = _u32(buf, off + 4)
        if off + 8 + size > end:
            if fcc == b"LIST":
                yield fcc, off + 8, end - off - 8
            break  # nothing addressable after an over-long chunk
        yield fcc, off + 8, size
        off += 8 + size + (size & 1)


class AviError(ValueError):
    pass


def _parse_headers(buf: bytes, off: int, end: int) -> dict:
    """Parse a ``hdrl`` LIST: main header + first video stream."""
    hdr: dict = {}
    for fcc, po, sz in _walk_chunks(buf, off, end):
        if fcc == b"avih" and sz >= 40:
            hdr["usec_per_frame"] = _u32(buf, po)
            hdr["n_frames"] = _u32(buf, po + 16)
            hdr["width"] = _u32(buf, po + 32)
            hdr["height"] = _u32(buf, po + 36)
        elif fcc == b"LIST" and buf[po : po + 4] == b"strl":
            for f2, p2, s2 in _walk_chunks(buf, po + 4, po + sz):
                if f2 == b"strh" and s2 >= 28:
                    if buf[p2 : p2 + 4] != b"vids":
                        break  # not the video stream — skip this strl
                    hdr["scale"] = _u32(buf, p2 + 20)
                    hdr["rate"] = _u32(buf, p2 + 24)
                elif f2 == b"strf" and s2 >= 20 and "bit_count" not in hdr:
                    hdr["bit_count"] = int.from_bytes(
                        buf[p2 + 14 : p2 + 16], _U32
                    )
                    hdr["compression"] = _u32(buf, p2 + 16)
    return hdr


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], int]:
    """Decode a DIB (uncompressed) or MJPEG AVI →
    (frames, usec_per_frame); each frame is (H, W, 3) uint8 RGB.
    Raises :class:`AviError` for non-AVI payloads and
    ``NotImplementedError`` for codec fourccs other than BI_RGB /
    'MJPG'."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI payload")
    end = min(len(payload), 8 + _u32(payload, 4))
    hdr: dict = {}
    raw_frames: list[bytes] = []
    for fcc, po, sz in _walk_chunks(payload, 12, end):
        if fcc != b"LIST":
            continue
        list_type = payload[po : po + 4]
        if list_type == b"hdrl":
            hdr = _parse_headers(payload, po + 4, po + sz)
        elif list_type == b"movi":
            for f2, p2, s2 in _walk_chunks(payload, po + 4, po + sz):
                # '##db' = uncompressed DIB, '##dc' = compressed
                if f2[2:4] in (b"db", b"dc"):
                    raw_frames.append((f2[2:4], payload[p2 : p2 + s2]))
    if not hdr or "width" not in hdr:
        raise AviError("AVI missing hdrl/avih headers")
    comp = hdr.get("compression", 0)
    # biCompression is BI_RGB (0) for DIB streams or a codec fourcc;
    # MJPEG ('MJPG') decodes natively through the repo's own T.81
    # JPEG decoder (llmdata/jpeg.py) — each '##dc' chunk is one
    # standalone JFIF image
    mjpg = comp == int.from_bytes(b"MJPG", _U32)
    if not mjpg and (comp != 0 or hdr.get("bit_count", 24) != 24):
        raise NotImplementedError(
            "only 24-bit BI_RGB (biCompression=0) and MJPG AVI streams "
            "decode natively; inject a decoder for other codecs"
        )
    w, h = hdr["width"], hdr["height"]
    row = (w * 3 + 3) // 4 * 4
    frames = []
    for kind, raw in raw_frames:
        if mjpg:
            from .jpeg import decode_jpeg

            img = decode_jpeg(raw)
            if img.ndim == 2:  # grayscale JPEG → RGB frame contract
                img = np.repeat(img[..., None], 3, axis=2)
            frames.append(img)
            continue
        if kind != b"db":
            raise NotImplementedError(
                "compressed AVI stream ('##dc' chunks) under a non-MJPG "
                "fourcc needs codec libraries not present here; inject a "
                "decoder (examples/custom_codec_injection.py)"
            )
        if len(raw) < row * h:
            raise AviError("frame chunk shorter than one DIB raster")
        arr = np.frombuffer(raw[: row * h], dtype=np.uint8).reshape(h, row)
        bgr = arr[:, : w * 3].reshape(h, w, 3)[::-1]  # bottom-up → top-down
        frames.append(bgr[..., ::-1].copy())  # BGR → RGB
    usec = hdr.get("usec_per_frame") or 0
    if not usec and hdr.get("rate"):
        usec = int(1_000_000 * hdr.get("scale", 1) / hdr["rate"])
    return frames, (usec or 40_000)  # default 25 fps if headers omit it


def encode_avi(
    frames: list[np.ndarray],
    usec_per_frame: int = 40_000,
    mjpeg: bool = False,
    quality: int = 90,
) -> bytes:
    """Fixture encoder: (H, W, 3) uint8 RGB frames → AVI bytes in the
    exact layouts :func:`decode_avi` consumes — uncompressed 24-bit
    BI_RGB ``00db`` chunks by default, or MJPEG (``mjpeg=True``): one
    JFIF image per ``00dc`` chunk from the repo's own JPEG encoder.
    Round-trips pinned in tests (pixel-identical for DIB; identical
    to the JPEG path's own decode for MJPEG — JPEG is lossy, so the
    pin is parity with ``decode_jpeg``, not the raw input)."""
    if not frames:
        raise AviError("need at least one frame")
    h, w = frames[0].shape[:2]
    row = (w * 3 + 3) // 4 * 4

    def dib(fr: np.ndarray) -> bytes:
        if fr.shape[:2] != (h, w):
            raise AviError("all frames must share one size")
        pad = np.zeros((h, row), dtype=np.uint8)
        pad[:, : w * 3] = fr[..., ::-1][::-1].reshape(h, w * 3)  # RGB→BGR, flip
        return pad.tobytes()

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + len(body).to_bytes(4, _U32) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    n = len(frames)
    avih = b"".join(
        v.to_bytes(4, _U32)
        for v in (
            usec_per_frame,
            min(row * h * (1_000_000 // max(usec_per_frame, 1)), 0xFFFFFFFF),
            0, 0x10, n, 0, 1, row * h, w, h, 0, 0, 0, 0,
        )
    )
    strh = (
        b"vids" + b"DIB " + (0).to_bytes(4, _U32) + (0).to_bytes(4, _U32)
        + (0).to_bytes(4, _U32)
        + usec_per_frame.to_bytes(4, _U32)  # dwScale
        + (1_000_000).to_bytes(4, _U32)     # dwRate → fps = rate/scale
        + (0).to_bytes(4, _U32) + n.to_bytes(4, _U32)
        + (row * h).to_bytes(4, _U32) + (0xFFFFFFFF).to_bytes(4, _U32)
        + (0).to_bytes(4, _U32)
        + (0).to_bytes(2, _U32) * 2 + w.to_bytes(2, _U32) + h.to_bytes(2, _U32)
    )
    strf = (
        (40).to_bytes(4, _U32)
        + w.to_bytes(4, _U32) + h.to_bytes(4, _U32)
        + (1).to_bytes(2, _U32) + (24).to_bytes(2, _U32)
        + (b"MJPG" if mjpeg else (0).to_bytes(4, _U32))  # biCompression
        + (row * h).to_bytes(4, _U32)
        + (0).to_bytes(4, _U32) * 4
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    if mjpeg:
        from .jpeg import encode_jpeg

        movi = lst(
            b"movi",
            b"".join(
                chunk(b"00dc", encode_jpeg(fr, quality=quality))
                for fr in frames
            ),
        )
    else:
        movi = lst(
            b"movi", b"".join(chunk(b"00db", dib(fr)) for fr in frames)
        )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, _U32) + body


def probe_avi(payload: bytes) -> dict:
    """Header-only AVI probe (no frame decode): dims, bit depth,
    frame count, duration — the crawl-filter fields."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI payload")
    end = min(len(payload), 8 + _u32(payload, 4))
    for fcc, po, sz in _walk_chunks(payload, 12, end):
        if fcc == b"LIST" and payload[po : po + 4] == b"hdrl":
            hdr = _parse_headers(payload, po + 4, po + sz)
            n = hdr.get("n_frames")
            usec = hdr.get("usec_per_frame")
            return {
                "fmt": "avi",
                "width": hdr.get("width"),
                "height": hdr.get("height"),
                "bit_depth": hdr.get("bit_count"),
                "n_frames": n,
                "duration_ms": (
                    n * usec // 1000 if n is not None and usec else None
                ),
            }
    raise AviError("AVI missing hdrl")


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_avi_frames(
    media: DataFrame, every_ms: int = 100, max_frames: int = 16
) -> DataFrame:
    """REAL video frame extraction for uncompressed-AVI payloads:
    demux, pick the frame nearest each ``every_ms`` timestamp
    (≤ ``max_frames``), emit as PPM bytes ready for
    ``image_decoder``/``image_resize`` — the same 1→N Arrow
    ``mapInPandas`` contract as ``gif.sample_gif_frames`` and
    ``multimodal.sample_frames``, the plumbing a real demuxer slots
    into via the ``decoder=`` injection point."""
    from .multimodal import encode_ppm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                frames, usec = decode_avi(bytes(payload))
                if not frames:
                    # structurally valid AVI whose movi list holds
                    # zero frame chunks — nothing to sample; skip the
                    # media row rather than index frames[0]
                    continue
                ms_per = max(usec // 1000, 1)
                total = ms_per * len(frames)
                picked = []
                for t in range(0, max(int(total), 1), every_ms):
                    fi = min(t // ms_per, len(frames) - 1)
                    picked.append((t, int(fi)))
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
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA])

    return media.mapInPandas(run, schema=_FRAME_SCHEMA)
