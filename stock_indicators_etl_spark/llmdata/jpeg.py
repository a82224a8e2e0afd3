"""Baseline + progressive JPEG (ITU-T T.81) codec in pure numpy + stdlib.

North-star multimodal surface (reference N/A). JPEG was the one
image format ``llmdata/multimodal.py`` still stubbed: the container
has no codec libraries, but sequential AND progressive JPEG are
implementable from the public spec with numpy — marker parsing,
DQT/DHT tables, canonical Huffman entropy decode, dequantize +
inverse zigzag, exact float IDCT (8×8 DCT-II basis matrices), chroma
upsampling for arbitrary h×v ∈ {1,2} sampling factors, YCbCr→RGB,
DRI/RSTn restart handling, and 0xFF00 byte unstuffing.

Progressive (SOF2, ~10 % of real crawled JPEGs) decodes for real:
coefficients accumulate across scans — interleaved DC first/refine
scans, non-interleaved per-component AC scans with spectral selection
(Ss..Se bands), successive approximation (Ah/Al point transforms —
arithmetic shift for DC, sign-magnitude truncation for AC, per T.81
G.1.2), and EOB-run coding — then one dequantize + IDCT pass at EOI.

The matching :func:`encode_jpeg` exists to generate fixtures (and to
round-trip-test every decoder branch: gray, 4:4:4, 4:2:0, restart
markers, 16-bit quant tables, and ``progressive=`` scan scripts with
and without successive approximation). It derives its Huffman tables
from the emitted symbols (fixed-length canonical codes — valid per
the spec since DHT carries the table), so no Annex K table
transcription is involved anywhere; the zigzag order is generated
programmatically from the diagonal traversal definition and pinned by
a unit test.

Arithmetic entropy coding (SOF9 sequential / SOF10 progressive, r8)
decodes and encodes for real through the T.81 Annex D coder + Annex
F/G conditioning models in ``llmdata/jpeg_arith.py`` — same MCU/scan
walk, different entropy layer. Lossless (SOF3/SOF11), hierarchical
(SOF5–7, SOF13–15), and 12-bit precision raise
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
SOF0, SOF1, SOF2 = 0xC0, 0xC1, 0xC2
SOF9, SOF10, DAC = 0xC9, 0xCA, 0xCC
# lossless (SOF3/SOF11), hierarchical (SOF5-7, SOF13-15)
SOF_UNSUPPORTED = {0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF}


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


def _decode_seq_block(reader, dc_tab, ac_tab, comp) -> np.ndarray:
    """One sequential (baseline) block: DC diff + AC run-length."""
    coef = np.zeros(64, dtype=np.int64)
    s = _huff_decode(reader, dc_tab)
    comp["dc"] += _extend(reader.read_bits(s), s)
    coef[0] = comp["dc"]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 15
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += r
        coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
        k += 1
    return coef


def _decode_dc_first(reader, dc_tab, comp, coef, al) -> None:
    s = _huff_decode(reader, dc_tab)
    comp["dc"] += _extend(reader.read_bits(s), s)
    coef[0] = comp["dc"] << al


def _decode_ac_first(reader, ac_tab, coef, ss, se, al, state) -> None:
    """AC first scan for one block (T.81 G.1.2.2): band Ss..Se,
    values scaled by 2^Al, EOB runs span blocks via state['eobrun']."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r) + bits(r) all-zero bands
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
        k += 1


def _decode_dc_refine(reader, coef, al) -> None:
    if reader.read_bit():
        coef[0] |= 1 << al  # two's-complement OR, sign-safe


def _decode_ac_refine(reader, ac_tab, coef, ss, se, al, state) -> None:
    """AC refinement for one block (T.81 G.1.2.3): newly significant
    coefficients arrive as ±1·2^Al; history-nonzero coefficients get
    one correction bit each as the band is traversed."""
    p1, m1 = 1 << al, -1 << al

    def correct(k: int) -> None:
        if reader.read_bit():
            v = coef[ZIGZAG[k]]
            if (v & p1) == 0:
                coef[ZIGZAG[k]] = v + (p1 if v >= 0 else m1)

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = (1 << r)
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break  # remaining band handled in the EOB path
                # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                newval = p1 if reader.read_bit() else m1
            # advance over r zero-history positions, emitting
            # correction bits at nonzero-history positions passed
            while k <= se:
                if coef[ZIGZAG[k]] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[ZIGZAG[k]] = newval
            k += 1
    if state["eobrun"] > 0:
        # EOB run covers this block: correction bits only
        while k <= se:
            if coef[ZIGZAG[k]] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF/JPEG bytes → (H, W) uint8 gray or (H, W, 3) RGB.
    Huffman sequential (SOF0/SOF1) and progressive (SOF2), plus
    arithmetic sequential (SOF9) and progressive (SOF10) — the
    Annex D coder and Annex F/G conditioning live in
    ``llmdata/jpeg_arith.py``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → table
    cond: dict[tuple[int, int], int] = {}  # DAC (class, id) → value
    frame = None
    progressive = False
    arith = False
    restart_interval = 0
    i = 2
    scans: list[dict] = []
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
        elif marker in (SOF0, SOF1, SOF2, SOF9, SOF10):
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            progressive = marker in (SOF2, SOF10)
            arith = marker in (SOF9, SOF10)
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in SOF_UNSUPPORTED:
            raise NotImplementedError(
                "only DCT-based 8-bit JPEG is supported (Huffman or "
                "arithmetic, sequential or progressive) — not lossless "
                "or hierarchical modes"
            )
        elif marker == DAC:
            j = 0
            while j + 1 < len(seg):
                cond[(seg[j] >> 4, seg[j] & 15)] = seg[j + 1]
                j += 2
        elif marker == DRI:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == SOS:
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cid, "td": tt >> 4, "ta": tt & 15})
            ss, se, ahl = seg[1 + 2 * ns : 4 + 2 * ns]
            # entropy-coded data runs to the next real marker
            j = i
            while j + 1 < len(payload):
                if payload[j] == 0xFF and payload[j + 1] not in (0x00,) and not (
                    0xD0 <= payload[j + 1] <= 0xD7
                ):
                    break
                j += 1
            scans.append(
                {
                    "comps": scan_comps,
                    "ss": ss,
                    "se": se,
                    "ah": ahl >> 4,
                    "al": ahl & 15,
                    "data": payload[i:j],
                    "dri": restart_interval,
                    # tables snapshot: DHT/DAC may redefine ids per scan
                    "huff": dict(huff),
                    "cond": dict(cond),
                }
            )
            i = j
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        # padded (interleaved) block dims; non-interleaved scans cover
        # only the real block dims below
        c["bh"], c["bw"] = mcuy * c["v"], mcux * c["h"]
        c["coef"] = np.zeros((c["bh"], c["bw"], 64), dtype=np.int64)
        # real per-component block dims (T.81 A.1.1: sample dims =
        # ceil(frame_dim * sampling / max_sampling), blocks = ceil(/8))
        samp_h = -(-(frame["h"] * c["v"]) // vmax)
        samp_w = -(-(frame["w"] * c["h"]) // hmax)
        c["rbh"] = -(-samp_h // 8)
        c["rbw"] = -(-samp_w // 8)

    for scan in scans:
        if arith:
            _decode_one_scan_arith(scan, by_id, mcux, mcuy, progressive)
        else:
            _decode_one_scan(scan, by_id, mcux, mcuy, progressive)

    h, w = frame["h"], frame["w"]
    planes = []
    for c in comps:
        plane = np.zeros((c["bh"] * 8, c["bw"] * 8))
        q = qt[c["tq"]]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                coef = c["coef"][by, bx]
                block = _idct2((coef * q).reshape(8, 8)) + 128.0
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
        # nearest-neighbor upsample to full resolution
        p = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_one_scan(scan, by_id, mcux, mcuy, progressive) -> None:
    """Decode one scan's entropy data into the components' coefficient
    arrays. Sequential: the single interleaved DC+AC scan. Progressive:
    one of DC-first / DC-refine / AC-first / AC-refine, interleaved
    (multi-component, DC only per G.1) or non-interleaved."""
    huff = scan["huff"]
    order = [by_id[sc["id"]] for sc in scan["comps"]]
    for c, sc in zip(order, scan["comps"]):
        c["td"], c["ta"] = sc["td"], sc["ta"]
        c["dc"] = 0
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    interleaved = len(order) > 1

    if interleaved or not progressive:
        units_total = mcux * mcuy
    else:
        units_total = order[0]["rbh"] * order[0]["rbw"]
    per_interval = scan["dri"] if scan["dri"] else units_total

    intervals = _split_entropy(scan["data"])
    interval_idx = 0
    reader = _BitReader(intervals[0])
    state = {"eobrun": 0}
    in_interval = 0

    def maybe_restart():
        nonlocal interval_idx, reader, in_interval
        if in_interval == per_interval:
            interval_idx += 1
            reader = _BitReader(intervals[interval_idx])
            in_interval = 0
            state["eobrun"] = 0
            for c in order:
                c["dc"] = 0

    if interleaved or not progressive:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for c in order:
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            by, bx = my * c["v"] + vy, mx * c["h"] + vx
                            if not progressive:
                                c["coef"][by, bx] = _decode_seq_block(
                                    reader,
                                    huff[(0, c["td"])],
                                    huff[(1, c["ta"])],
                                    c,
                                )
                            elif ah == 0:  # DC first (ss==0 per spec)
                                _decode_dc_first(
                                    reader,
                                    huff[(0, c["td"])],
                                    c,
                                    c["coef"][by, bx],
                                    al,
                                )
                            else:  # DC refine
                                _decode_dc_refine(
                                    reader, c["coef"][by, bx], al
                                )
                in_interval += 1
        return

    # non-interleaved progressive scan (single component)
    c = order[0]
    for by in range(c["rbh"]):
        for bx in range(c["rbw"]):
            maybe_restart()
            coef = c["coef"][by, bx]
            if ss == 0:
                if ah == 0:
                    _decode_dc_first(reader, huff[(0, c["td"])], c, coef, al)
                else:
                    _decode_dc_refine(reader, coef, al)
            elif ah == 0:
                _decode_ac_first(
                    reader, huff[(1, c["ta"])], coef, ss, se, al, state
                )
            else:
                _decode_ac_refine(
                    reader, huff[(1, c["ta"])], coef, ss, se, al, state
                )
            in_interval += 1


def _decode_one_scan_arith(scan, by_id, mcux, mcuy, progressive) -> None:
    """Arithmetic twin of :func:`_decode_one_scan` (SOF9/SOF10): same
    MCU/block walk, entropy decisions through the Annex D coder with
    the Annex F/G conditioning contexts. Statistics, the coder state,
    and DC predictions all reset per scan and at every restart marker
    (T.81 F.1.4.4 / D.2)."""
    from stock_indicators_etl_spark.llmdata import jpeg_arith as ja

    order = [by_id[sc["id"]] for sc in scan["comps"]]
    for c, sc in zip(order, scan["comps"]):
        c["td"], c["ta"] = sc["td"], sc["ta"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    interleaved = len(order) > 1

    if interleaved or not progressive:
        units_total = mcux * mcuy
    else:
        units_total = order[0]["rbh"] * order[0]["rbw"]
    per_interval = scan["dri"] if scan["dri"] else units_total

    intervals = _split_entropy(scan["data"])
    dc_ids = sorted({c["td"] for c in order})
    ac_ids = sorted({c["ta"] for c in order})

    def fresh_ctxs():
        for c in order:
            c["dc"] = 0
            c["dcctx"] = 0
        return ja.new_contexts(dc_ids, ac_ids, scan["cond"])

    interval_idx = 0
    dec = ja.ArithDecoder(intervals[0])
    ctxs = fresh_ctxs()
    in_interval = 0

    def maybe_restart():
        nonlocal interval_idx, dec, ctxs, in_interval
        if in_interval == per_interval:
            interval_idx += 1
            dec = ja.ArithDecoder(intervals[interval_idx])
            ctxs = fresh_ctxs()
            in_interval = 0

    if interleaved or not progressive:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for c in order:
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            by, bx = my * c["v"] + vy, mx * c["h"] + vx
                            coef = c["coef"][by, bx]
                            if not progressive:
                                ja.decode_block_seq(dec, ctxs, c, coef)
                            elif ah == 0:  # DC first
                                ja.decode_dc_first(dec, ctxs, c, coef, al)
                            else:  # DC refine
                                ja.decode_dc_refine(dec, ctxs, coef, al)
                in_interval += 1
        return

    # non-interleaved progressive scan (single component)
    c = order[0]
    for by in range(c["rbh"]):
        for bx in range(c["rbw"]):
            maybe_restart()
            coef = c["coef"][by, bx]
            if ss == 0:
                if ah == 0:
                    ja.decode_dc_first(dec, ctxs, c, coef, al)
                else:
                    ja.decode_dc_refine(dec, ctxs, coef, al)
            elif ah == 0:
                ja.decode_ac_first(dec, ctxs, c, coef, ss, se, al)
            else:
                ja.decode_ac_refine(dec, ctxs, c, coef, ss, se, al)
            in_interval += 1


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
    progressive: bool = False,
    successive: bool = True,
    arithmetic: bool = False,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline or progressive
    JFIF bytes.

    ``subsample``: "444" (no chroma subsampling) or "420" (2×2 mean).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (sequential only). ``force_16bit_qt`` writes pq=1 DQT
    segments (decoder branch coverage). ``progressive=True`` emits
    SOF2 with a scan script: spectral selection only
    (``successive=False`` — DC, AC 1–5, AC 6–63 per component) or
    spectral selection + successive approximation (``successive=True``
    — DC at Al=1, AC bands at Al=1, then DC and AC refinement scans at
    Al=0, exercising the T.81 G.1.2 point transforms and
    correction-bit paths). ``arithmetic=True`` swaps the entropy
    coder for the Annex D arithmetic coder (SOF9, or SOF10 when
    combined with ``progressive``): a DAC segment carries the default
    conditioning, no DHT is emitted, and the same scan scripts /
    restart semantics apply."""
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

    if progressive:
        if restart_interval:
            raise ValueError(
                "progressive fixture encoder does not emit restart markers"
            )
        return _emit_progressive(
            gray, h, w, samps, qids, qts, comp_blocks, mcux, mcuy,
            force_16bit_qt, successive, arithmetic,
        )
    if arithmetic:
        return _emit_arith_sequential(
            gray, h, w, samps, qids, qts, comp_blocks, mcux, mcuy,
            force_16bit_qt, restart_interval,
        )

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


def _jfif_headers(seg, qts, force_16bit_qt, sof_marker, h, w, samps, qids):
    """Shared APP0 + DQT + SOF emission."""
    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in qts.items():
        q_zz = q[ZIGZAG]  # DQT carries zigzag order (T.81 B.2.4.1)
        if force_16bit_qt:
            seg(DQT, bytes([16 | tq]) + q_zz.astype(">u2").tobytes())
        else:
            seg(DQT, bytes([tq]) + q_zz.astype(np.uint8).tobytes())
    ncomp = len(samps)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samps[ci][0] << 4) | samps[ci][1], qids[ci]])
    seg(sof_marker, sof)


def _dac_body(classes) -> bytes:
    """DAC segment with the T.81 default conditioning (explicit for
    decoder coverage — the same values apply when DAC is absent)."""
    from stock_indicators_etl_spark.llmdata import jpeg_arith as ja

    body = b""
    for cls in classes:
        body += bytes([cls, (ja.DEFAULT_DC_U << 4) | ja.DEFAULT_DC_L])
        body += bytes([(1 << 4) | cls, ja.DEFAULT_AC_KX])
    return body


def _nat_block(zz_coef: np.ndarray) -> np.ndarray:
    """Stream-order (zigzag) coefficients → natural-order block."""
    nat = np.zeros(64, dtype=np.int64)
    nat[ZIGZAG] = zz_coef
    return nat


def _emit_arith_sequential(
    gray, h, w, samps, qids, qts, comp_blocks, mcux, mcuy,
    force_16bit_qt, restart_interval,
) -> bytes:
    """SOF9: one interleaved sequential scan through the Annex D
    coder. Restart markers flush the coder and reset statistics + DC
    predictions, mirroring the decoder."""
    from stock_indicators_etl_spark.llmdata import jpeg_arith as ja

    ncomp = len(samps)
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    _jfif_headers(seg, qts, force_16bit_qt, SOF9, h, w, samps, qids)
    classes = [0] if gray else [0, 1]
    seg(DAC, _dac_body(classes))
    if restart_interval:
        seg(DRI, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = 0 if ci == 0 or gray else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    seg(SOS, sos)

    comp_state = [
        {"td": 0 if ci == 0 or gray else 1,
         "ta": 0 if ci == 0 or gray else 1,
         "dc": 0, "dcctx": 0}
        for ci in range(ncomp)
    ]

    def fresh():
        for cs in comp_state:
            cs["dc"] = 0
            cs["dcctx"] = 0
        return ja.ArithEncoder(), ja.new_contexts(classes, classes, None)

    per_interval = restart_interval if restart_interval else mcux * mcuy
    enc, ctxs = fresh()
    rst = 0
    count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if count == per_interval:
                out.extend(ja.stuff(enc.flush()))
                out.extend(b"\xff" + bytes([0xD0 + (rst % 8)]))
                rst += 1
                enc, ctxs = fresh()
                count = 0
            for ci, (sh, sv) in enumerate(samps):
                for vy in range(sv):
                    for vx in range(sh):
                        nat = _nat_block(
                            comp_blocks[ci][(my * sv + vy, mx * sh + vx)]
                        )
                        ja.encode_block_seq(enc, ctxs, comp_state[ci], nat)
            count += 1
    out.extend(ja.stuff(enc.flush()))
    out.extend(b"\xff\xd9")
    return bytes(out)


ZIGZAG_INV = np.argsort(ZIGZAG)  # natural position → stream position


def _pad_to(p: np.ndarray, m: int) -> np.ndarray:
    h, w = p.shape
    return _pad_edge(p, ((h + m - 1) // m) * m, ((w + m - 1) // m) * m)


def _pad_edge(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")


# ---------------------------------------------------------------------------
# progressive encoder (fixture generator for the SOF2 decoder paths)
# ---------------------------------------------------------------------------


def _dc_sym(diff: int) -> tuple[int, int]:
    s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
    mag = diff if diff >= 0 else diff + (1 << s) - 1
    return s, mag


class _Tokens:
    """Two-pass scan serialization: collect (symbol | raw-bit) tokens,
    build the scan's Huffman table from the symbols, then write."""

    def __init__(self) -> None:
        self.toks: list[tuple] = []

    def sym(self, cls: int, s: int) -> None:
        self.toks.append(("s", cls, s))

    def bits(self, v: int, n: int) -> None:
        if n:
            self.toks.append(("b", v, n))

    def symbols(self, cls: int) -> list[int]:
        return [t[2] for t in self.toks if t[0] == "s" and t[1] == cls]


def _tokens_dc_first(
    comp_blocks, samps, gray, mcux, mcuy, al
) -> _Tokens:
    """Interleaved DC-first scan: diffs of the arithmetic-shifted DC
    (T.81 G.1.2.1 — DC point transform is an arithmetic shift)."""
    tk = _Tokens()
    dc_prev = [0] * len(samps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samps):
                cls = 0 if ci == 0 or gray else 1
                for vy in range(sv):
                    for vx in range(sh):
                        zz = comp_blocks[ci][(my * sv + vy, mx * sh + vx)]
                        v = int(zz[0]) >> al
                        s, mag = _dc_sym(v - dc_prev[ci])
                        dc_prev[ci] = v
                        tk.sym(cls, s)
                        tk.bits(mag, s)
    return tk


def _tokens_dc_refine(comp_blocks, samps, mcux, mcuy, al) -> list[tuple]:
    """Interleaved DC-refinement scan: one raw bit per block — no
    Huffman coding at all (returned as raw-bit tokens only)."""
    toks = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samps):
                for vy in range(sv):
                    for vx in range(sh):
                        zz = comp_blocks[ci][(my * sv + vy, mx * sh + vx)]
                        toks.append(("b", (int(zz[0]) >> al) & 1, 1))
    return toks


def _tokens_ac_first(blocks, rbh, rbw, ss, se, al) -> _Tokens:
    """Non-interleaved AC-first scan with cross-block EOB runs. AC
    point transform truncates toward zero in sign-magnitude (G.1.2.1)."""
    tk = _Tokens()
    state = {"eobrun": 0}

    def flush() -> None:
        n = state["eobrun"]
        if n:
            r = n.bit_length() - 1
            tk.sym(0, r << 4)
            tk.bits(n - (1 << r), r)
            state["eobrun"] = 0

    for by in range(rbh):
        for bx in range(rbw):
            zz = blocks[(by, bx)]
            a = [
                (1 if int(zz[k]) >= 0 else -1) * (abs(int(zz[k])) >> al)
                for k in range(ss, se + 1)
            ]
            if not any(a):
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    flush()
                continue
            flush()
            run = 0
            last_nonzero = max(i for i, v in enumerate(a) if v)
            for i, v in enumerate(a):
                if i > last_nonzero:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    tk.sym(0, 0xF0)  # ZRL
                    run -= 16
                s = v.bit_length() if v > 0 else (-v).bit_length()
                mag = v if v >= 0 else v + (1 << s) - 1
                tk.sym(0, (run << 4) | s)
                tk.bits(mag, s)
                run = 0
            if last_nonzero < se - ss:  # zero tail → this block EOBs
                state["eobrun"] += 1
    flush()
    return tk


def _tokens_ac_refine(blocks, rbh, rbw, ss, se, al) -> _Tokens:
    """Non-interleaved AC-refinement scan (G.1.2.3): newly significant
    coefficients as ±1·2^Al, correction bits for history-nonzero ones
    buffered and emitted after each symbol, cross-block EOB runs with
    their covered correction bits."""
    tk = _Tokens()
    state = {"eobrun": 0, "pending": []}

    def flush() -> None:
        n = state["eobrun"]
        if n:
            r = n.bit_length() - 1
            tk.sym(0, r << 4)
            tk.bits(n - (1 << r), r)
        for b in state["pending"]:
            tk.bits(b, 1)
        state["eobrun"] = 0
        state["pending"] = []

    for by in range(rbh):
        for bx in range(rbw):
            zz = blocks[(by, bx)]
            vals = [int(zz[k]) for k in range(ss, se + 1)]
            absshift = [abs(v) >> al for v in vals]
            has_new = any(s == 1 for s in absshift)
            if not has_new:
                # whole band via the EOB path: correction bits only
                state["eobrun"] += 1
                state["pending"].extend(s & 1 for s in absshift if s > 1)
                if state["eobrun"] == 0x7FFF:
                    flush()
                continue
            flush()
            # events since the last symbol, in traversal order:
            # "z" = zero-history position, ("c", bit) = correction bit
            # at a history-nonzero position. The decoder reads a
            # correction bit exactly when its position is traversed,
            # so a ZRL carries only the bits interleaved among ITS 16
            # zero-history positions — bits beyond the 16th zero stay
            # queued for the next symbol's advance.
            events: list = []
            nz = 0
            for v, s in zip(vals, absshift):
                if s > 1:  # history nonzero → correction bit
                    events.append(("c", s & 1))
                    continue
                if s == 0:
                    events.append("z")
                    nz += 1
                    continue
                # newly significant (s == 1)
                while nz > 15:
                    tk.sym(0, 0xF0)
                    popped = 0
                    while popped < 16:
                        e = events.pop(0)
                        if e == "z":
                            popped += 1
                        else:
                            tk.bits(e[1], 1)
                    nz -= 16
                tk.sym(0, (nz << 4) | 1)
                tk.bits(1 if v > 0 else 0, 1)  # sign
                for e in events:
                    if e != "z":
                        tk.bits(e[1], 1)
                events = []
                nz = 0
            if events:
                # band tail has no new coefficient → EOB covers it
                state["eobrun"] += 1
                state["pending"].extend(e[1] for e in events if e != "z")
    flush()
    return tk


def _emit_progressive(
    gray, h, w, samps, qids, qts, comp_blocks, mcux, mcuy,
    force_16bit_qt, successive, arithmetic=False,
) -> bytes:
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    ncomp = len(samps)
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    _jfif_headers(
        seg, qts, force_16bit_qt, SOF10 if arithmetic else SOF2,
        h, w, samps, qids,
    )
    if arithmetic:
        return _emit_arith_progressive(
            out, seg, gray, h, w, samps, comp_blocks, mcux, mcuy,
            successive,
        )

    # per-component REAL block dims (non-interleaved AC scan coverage)
    rdims = []
    for sh, sv in samps:
        samp_h = -(-(h * sv) // vmax)
        samp_w = -(-(w * sh) // hmax)
        rdims.append((-(-samp_h // 8), -(-samp_w // 8)))

    def write_tokens(tk: _Tokens, tc: int) -> bytes:
        """Build per-class tables from the tokens, emit DHT segs,
        return the serialized entropy bytes (DHT written via seg)."""
        classes = sorted({t[1] for t in tk.toks if t[0] == "s"})
        enc = {}
        for cls in classes:
            counts, symbols = _fixed_len_huff(tk.symbols(cls) or [0])
            seg(DHT, bytes([(tc << 4) | cls]) + bytes(counts) + symbols)
            code = 0
            k = 0
            table = {}
            for length in range(1, 17):
                for _ in range(counts[length - 1]):
                    table[symbols[k]] = (length, code)
                    code += 1
                    k += 1
                code <<= 1
            enc[cls] = table
        bw = _BitWriter()
        for t in tk.toks:
            if t[0] == "s":
                ln, code = enc[t[1]][t[2]]
                bw.write(code, ln)
            else:
                bw.write(t[1], t[2])
        bw.flush()
        return bytes(bw.out)

    def sos_header(comp_ids: list[int], tds: list[int], tas: list[int],
                   ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return body

    al1 = 1 if successive else 0

    # scan 1: interleaved DC first
    tk = _tokens_dc_first(comp_blocks, samps, gray, mcux, mcuy, al1)
    classes = [0] if gray else [0, 1]
    entropy = write_tokens(tk, tc=0)
    seg(SOS, sos_header(
        list(range(1, ncomp + 1)),
        [0 if ci == 0 or gray else 1 for ci in range(ncomp)],
        [0] * ncomp, 0, 0, 0, al1,
    ))
    out.extend(entropy)

    # AC first scans: two spectral bands per component
    for ci in range(ncomp):
        rbh, rbw = rdims[ci]
        for ss, se in ((1, 5), (6, 63)):
            tk = _tokens_ac_first(comp_blocks[ci], rbh, rbw, ss, se, al1)
            entropy = write_tokens(tk, tc=1)
            seg(SOS, sos_header([ci + 1], [0], [0], ss, se, 0, al1))
            out.extend(entropy)

    if successive:
        # DC refinement (raw bits, no Huffman table)
        toks = _tokens_dc_refine(comp_blocks, samps, mcux, mcuy, 0)
        bw = _BitWriter()
        for _, v, n in toks:
            bw.write(v, n)
        bw.flush()
        seg(SOS, sos_header(
            list(range(1, ncomp + 1)), [0] * ncomp, [0] * ncomp, 0, 0, 1, 0,
        ))
        out.extend(bytes(bw.out))

        # AC refinement per component over the full band
        for ci in range(ncomp):
            rbh, rbw = rdims[ci]
            tk = _tokens_ac_refine(comp_blocks[ci], rbh, rbw, 1, 63, 0)
            entropy = write_tokens(tk, tc=1)
            seg(SOS, sos_header([ci + 1], [0], [0], 1, 63, 1, 0))
            out.extend(entropy)

    out.extend(b"\xff\xd9")
    return bytes(out)


def _emit_arith_progressive(
    out, seg, gray, h, w, samps, comp_blocks, mcux, mcuy, successive,
) -> bytes:
    """SOF10: the same scan script as the Huffman progressive path
    (interleaved DC first, per-component AC bands, then DC/AC
    refinement when ``successive``), entropy-coded with the Annex D
    coder + G.2 conditioning. Fresh coder and statistics per scan."""
    from stock_indicators_etl_spark.llmdata import jpeg_arith as ja

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    ncomp = len(samps)
    classes = [0] if gray else [0, 1]
    cls_of = [0 if ci == 0 or gray else 1 for ci in range(ncomp)]
    seg(DAC, _dac_body(classes))

    nat_blocks = [
        {k: _nat_block(v) for k, v in blocks.items()} for blocks in comp_blocks
    ]
    rdims = []
    for sh, sv in samps:
        samp_h = -(-(h * sv) // vmax)
        samp_w = -(-(w * sh) // hmax)
        rdims.append((-(-samp_h // 8), -(-samp_w // 8)))

    def sos_header(comp_ids, tds, tas, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return body

    def fresh():
        return ja.ArithEncoder(), ja.new_contexts(classes, classes, None)

    al1 = 1 if successive else 0

    # scan 1: interleaved DC first
    enc, ctxs = fresh()
    comp_state = [
        {"td": cls_of[ci], "ta": cls_of[ci], "dc": 0, "dcctx": 0}
        for ci in range(ncomp)
    ]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samps):
                for vy in range(sv):
                    for vx in range(sh):
                        ja.encode_dc_first(
                            enc, ctxs, comp_state[ci],
                            nat_blocks[ci][(my * sv + vy, mx * sh + vx)],
                            al1,
                        )
    seg(SOS, sos_header(
        list(range(1, ncomp + 1)), cls_of, [0] * ncomp, 0, 0, 0, al1,
    ))
    out.extend(ja.stuff(enc.flush()))

    # AC first scans: two spectral bands per component
    for ci in range(ncomp):
        rbh, rbw = rdims[ci]
        for ss, se in ((1, 5), (6, 63)):
            enc, ctxs = fresh()
            cs = {"td": cls_of[ci], "ta": cls_of[ci]}
            for by in range(rbh):
                for bx in range(rbw):
                    ja.encode_ac_first(
                        enc, ctxs, cs, nat_blocks[ci][(by, bx)], ss, se, al1
                    )
            seg(SOS, sos_header(
                [ci + 1], [0], [cls_of[ci]], ss, se, 0, al1,
            ))
            out.extend(ja.stuff(enc.flush()))

    if successive:
        # DC refinement (fixed-bin decisions)
        enc, ctxs = fresh()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samps):
                    for vy in range(sv):
                        for vx in range(sh):
                            ja.encode_dc_refine(
                                enc, ctxs,
                                nat_blocks[ci][(my * sv + vy, mx * sh + vx)],
                                0,
                            )
        seg(SOS, sos_header(
            list(range(1, ncomp + 1)), [0] * ncomp, [0] * ncomp, 0, 0, 1, 0,
        ))
        out.extend(ja.stuff(enc.flush()))

        # AC refinement per component over the full band
        for ci in range(ncomp):
            rbh, rbw = rdims[ci]
            enc, ctxs = fresh()
            cs = {"td": cls_of[ci], "ta": cls_of[ci]}
            for by in range(rbh):
                for bx in range(rbw):
                    ja.encode_ac_refine(
                        enc, ctxs, cs, nat_blocks[ci][(by, bx)], 1, 63, 0
                    )
            seg(SOS, sos_header([ci + 1], [0], [cls_of[ci]], 1, 63, 1, 0))
            out.extend(ja.stuff(enc.flush()))

    out.extend(b"\xff\xd9")
    return bytes(out)
