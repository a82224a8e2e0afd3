"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib.

North-star multimodal surface (reference N/A). JPEG was the one
image format ``llmdata/multimodal.py`` still stubbed: the container
has no codec libraries, but baseline sequential JPEG is implementable
from the public spec with numpy — marker parsing, DQT/DHT tables,
canonical Huffman entropy decode, dequantize + inverse zigzag, exact
float IDCT (8×8 DCT-II basis matrices), chroma upsampling for
arbitrary h×v ∈ {1,2} sampling factors, YCbCr→RGB, DRI/RSTn restart
handling, and 0xFF00 byte unstuffing.

The matching :func:`encode_jpeg` exists to generate fixtures (and to
round-trip-test every decoder branch: gray, 4:4:4, 4:2:0, restart
markers, 16-bit quant tables). It derives its Huffman tables from the
emitted symbols (fixed-length canonical codes — valid per the spec
since DHT carries the table), so no Annex K table transcription is
involved anywhere; the zigzag order is generated programmatically
from the diagonal traversal definition and pinned by a unit test.

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
``NotImplementedError`` honestly.

Scale: decode runs inside the same Arrow-batched ``mapInPandas``
plumbing as every other media kernel (multimodal.extract_media_
features) — per-task memory bounded by the batch, pixels never
shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Stream position k → natural (row-major) position, by the
    diagonal-traversal definition (up-right on even diagonals)."""
    order: list[int] = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order.extend(r * 8 + c for r, c in diag)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()

_ns = np.arange(8)
_C = np.cos((2 * _ns[None, :] + 1) * _ns[:, None] * np.pi / 16) / 2.0
_C[0, :] *= 1.0 / np.sqrt(2.0)  # DCT-II orthonormal basis, rows = freqs


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# markers
SOI, EOI, SOS, DQT, DHT, DRI = 0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xDD
SOF0 = 0xC0
SOF_UNSUPPORTED = {0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF}


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _build_huff(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: (code_length, code) → symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _split_entropy(data: bytes) -> list[bytes]:
    """Split the scan's entropy bytes on RSTn markers and unstuff
    0xFF00 → 0xFF in each interval."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0xFF and i + 1 < len(data):
            nxt = data[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))
    return intervals


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes → (H, W) uint8 gray or (H, W, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → table
    frame = None
    restart_interval = 0
    i = 2
    scan_data = None
    scan_comps = None
    while i < len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        i += 2
        if marker == 0xFF:  # fill byte before a marker
            i -= 1
            continue
        if marker in (SOI, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == EOI:
            break
        if i + 2 > len(payload):
            raise ValueError("JPEG truncated in marker segment")
        ln = struct.unpack(">H", payload[i : i + 2])[0]
        if ln < 2:
            raise ValueError("malformed JPEG segment length")
        seg = payload[i + 2 : i + ln]
        i += ln
        if marker == DQT:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    stream = np.frombuffer(
                        seg[j : j + 64], dtype=np.uint8
                    ).astype(np.int64)
                    j += 64
                else:
                    stream = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    ).astype(np.int64)
                    j += 128
                # DQT values arrive in zigzag order (T.81 B.2.4.1)
                qt[tq] = stream[ZIGZAG_INV]
        elif marker == DHT:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                symbols = seg[j + 17 : j + 17 + n]
                huff[(tc, th)] = _build_huff(counts, symbols)
                j += 17 + n
        elif marker == SOF0:
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in SOF_UNSUPPORTED:
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) is supported"
            )
        elif marker == DRI:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == SOS:
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cid, "td": tt >> 4, "ta": tt & 15})
            # entropy-coded data runs to the next real marker
            j = i
            while j + 1 < len(payload):
                if payload[j] == 0xFF and payload[j + 1] not in (0x00,) and not (
                    0xD0 <= payload[j + 1] <= 0xD7
                ):
                    break
                j += 1
            scan_data = payload[i:j]
            i = j
    if frame is None or scan_data is None:
        raise ValueError("JPEG missing SOF0/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        c = by_id[sc["id"]]
        c["td"], c["ta"] = sc["td"], sc["ta"]
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        c["dc"] = 0

    intervals = _split_entropy(scan_data)
    interval_idx = 0
    reader = _BitReader(intervals[0])
    per_interval = restart_interval if restart_interval else mcux * mcuy
    mcu_in_interval = 0
    order = [by_id[sc["id"]] for sc in scan_comps]
    for my in range(mcuy):
        for mx in range(mcux):
            if mcu_in_interval == per_interval:
                interval_idx += 1
                reader = _BitReader(intervals[interval_idx])
                mcu_in_interval = 0
                for c in order:
                    c["dc"] = 0
            for c in order:
                q = qt[c["tq"]]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(reader, huff[(0, c["td"])])
                        c["dc"] += _extend(reader.read_bits(s), s)
                        coef[0] = c["dc"]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff[(1, c["ta"])])
                            r, s = rs >> 4, rs & 15
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = _idct2((coef * q).reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_in_interval += 1

    h, w = frame["h"], frame["w"]
    planes = []
    for c in comps:
        p = c["plane"]
        # nearest-neighbor upsample to full resolution
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixture generator; any spec-valid table works — DHT/DQT
# carry them, so nothing is transcribed from Annex K)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec


def _quant_table(quality: int, chroma: bool) -> np.ndarray:
    """Deterministic formula-derived table (natural order): ramps with
    frequency, scaled by quality ∈ [1, 100]. Spec-valid (any 1–255
    values); carried verbatim in DQT."""
    scale = max(1.0, 50.0 / max(quality, 1))
    u, v = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    base = 1 + (u + v) * (3 if chroma else 2)
    return np.clip(np.rint(base * scale), 1, 255).astype(np.int64).reshape(-1)


def _fixed_len_huff(symbols_used: list[int]) -> tuple[list[int], bytes]:
    """Fixed-length canonical code covering the used symbols: counts
    put all n symbols at length L = ceil(log2(n+1)) (so the all-ones
    code stays unused, as T.81 requires)."""
    syms = sorted(set(symbols_used))
    n = len(syms)
    length = max(1, int(np.ceil(np.log2(n + 1))))
    counts = [0] * 16
    counts[length - 1] = n
    return counts, bytes(syms)


def _encode_coefs(coef: np.ndarray, dc_prev: int) -> tuple[list, list, int]:
    """One block's zigzag coefficients → (dc_sym_bits, ac_sym_bits)."""
    dc_diff = int(coef[0]) - dc_prev
    s = int(dc_diff).bit_length() if dc_diff != 0 else 0
    if dc_diff < 0:
        s = int(-dc_diff).bit_length()
    mag = dc_diff if dc_diff >= 0 else dc_diff + (1 << s) - 1
    dc = [(s, mag, s)]
    ac = []
    run = 0
    for k in range(1, 64):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac.append((0xF0, 0, 0))
            run -= 16
        sz = v.bit_length() if v > 0 else (-v).bit_length()
        m = v if v >= 0 else v + (1 << sz) - 1
        ac.append(((run << 4) | sz, m, sz))
        run = 0
    if run:
        ac.append((0x00, 0, 0))
    return dc, ac, int(coef[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
    force_16bit_qt: bool = False,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline JFIF bytes.

    ``subsample``: "444" (no chroma subsampling) or "420" (2×2 mean).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs. ``force_16bit_qt`` writes pq=1 DQT segments (decoder branch
    coverage)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img - 128.0]
        samps = [(1, 1)]
        qids = [0]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            # pad to even then 2×2 mean
            cbp = _pad_to(cb, 2)
            crp = _pad_to(cr, 2)
            cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4
            cr = (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4
            samps = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            samps = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsample must be '444' or '420'")
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qids = [0, 1, 1]
    qts = {0: _quant_table(quality, chroma=False)}
    if not gray:
        qts[1] = _quant_table(quality, chroma=True)

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # forward DCT + quantize every block, store zigzag coefficients
    comp_blocks = []
    for plane, (sh, sv), qid in zip(planes, samps, qids):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        p = _pad_edge(plane, ph, pw)
        q = qts[qid].reshape(8, 8)
        blocks = {}
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = _fdct2(p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
                # stream position k carries natural position ZIGZAG[k]
                zz = np.rint(blk / q).astype(np.int64).reshape(-1)[ZIGZAG]
                blocks[(by, bx)] = zz
        comp_blocks.append(blocks)

    # first pass: gather symbols per table class (luma=0, chroma=1)
    dc_syms: dict[int, list[int]] = {0: [], 1: []}
    ac_syms: dict[int, list[int]] = {0: [], 1: []}
    per_interval = restart_interval if restart_interval else mcux * mcuy

    def _mcu_stream():
        dc_prev = [0] * len(planes)
        count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if count == per_interval:
                    count = 0
                    dc_prev = [0] * len(planes)
                    yield ("RST", None, None, None)
                for ci, (sh, sv) in enumerate(samps):
                    for vy in range(sv):
                        for vx in range(sh):
                            zz = comp_blocks[ci][(my * sv + vy, mx * sh + vx)]
                            dc, ac, newdc = _encode_coefs(zz, dc_prev[ci])
                            dc_prev[ci] = newdc
                            yield ("BLK", ci, dc, ac)
                count += 1

    for kind, ci, dc, ac in _mcu_stream():
        if kind == "RST":
            continue
        cls = 0 if ci == 0 or gray else 1
        dc_syms[cls].extend(s for s, _, _ in dc)
        ac_syms[cls].extend(s for s, _, _ in ac)

    tables = {}
    for cls in ([0] if gray else [0, 1]):
        tables[(0, cls)] = _fixed_len_huff(dc_syms[cls] or [0])
        tables[(1, cls)] = _fixed_len_huff(ac_syms[cls] or [0])

    def _codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
        out = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                out[symbols[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return out

    enc = {key: _codes(*tab) for key, tab in tables.items()}

    # ---- emit ----
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    # JFIF APP0
    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in qts.items():
        q_zz = q[ZIGZAG]  # DQT carries zigzag order (T.81 B.2.4.1)
        if force_16bit_qt:
            seg(DQT, bytes([16 | tq]) + q_zz.astype(">u2").tobytes())
        else:
            seg(DQT, bytes([tq]) + q_zz.astype(np.uint8).tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samps[ci][0] << 4) | samps[ci][1], qids[ci]])
    seg(SOF0, sof)
    for (tc, th), (counts, symbols) in sorted(tables.items()):
        seg(DHT, bytes([(tc << 4) | th]) + bytes(counts) + symbols)
    if restart_interval:
        seg(DRI, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = 0 if ci == 0 or gray else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    seg(SOS, sos)

    bw = _BitWriter()
    rst = 0
    for kind, ci, dc, ac in _mcu_stream():
        if kind == "RST":
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(b"\xff" + bytes([0xD0 + (rst % 8)]))
            rst += 1
            continue
        cls = 0 if ci == 0 or gray else 1
        for s, mag, nbits in dc:
            ln, code = enc[(0, cls)][s]
            bw.write(code, ln)
            if nbits:
                bw.write(mag, nbits)
        for s, mag, nbits in ac:
            ln, code = enc[(1, cls)][s]
            bw.write(code, ln)
            if nbits:
                bw.write(mag, nbits)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


ZIGZAG_INV = np.argsort(ZIGZAG)  # natural position → stream position


def _pad_to(p: np.ndarray, m: int) -> np.ndarray:
    h, w = p.shape
    return _pad_edge(p, ((h + m - 1) // m) * m, ((w + m - 1) // m) * m)


def _pad_edge(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
