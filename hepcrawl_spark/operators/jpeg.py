"""Baseline JPEG (ITU-T T.81 / ISO 10918-1, SOF0) codec — stdlib + numpy
only, no PIL/libjpeg.

The web's most common image format, made REAL for the multimodal pipeline
(`operators/multimodal.py` dispatches here): marker walk -> DQT/DHT/SOF0/
SOS/DRI parse -> byte-unstuffed entropy-coded segments -> Huffman decode
(tables built generically from the stream's own DHT segments, so any
baseline file decodes, not just ours) -> dequantize -> inverse zigzag ->
2-D IDCT (orthonormal DCT-II basis matrix, one numpy matmul pair per
block) -> chroma upsample -> JFIF YCbCr->RGB. Supports 1- and
3-component scans, arbitrary sampling factors up to 2x2 (4:4:4, 4:2:2,
4:2:0), and DRI restart markers. Progressive (SOF2), arithmetic coding,
and 12-bit precision raise NotImplementedError into multimodal's tested
error-row path.

The encoder exists so tests and the media synthesizer have deterministic
fixtures without any imaging library: forward DCT -> quantize (quality-
scaled Annex-K-style flat tables) -> zigzag -> DC-diff/AC-RLE -> a
minimal-but-valid canonical Huffman code (every used symbol at 9 bits —
DHT declares the table, so the decoder side needs nothing special) ->
byte stuffing. Optional 4:2:0 subsampling exercises the decoder's
upsample path. Lossy roundtrip: decode(encode(img)) matches to within
quantization error, asserted in tests/test_multimodal.py.

Reference context: hepcrawl never decodes media (its binary payloads are
PDF/XML documents, e.g. `hepcrawl/spiders/wsp_spider.py` download paths);
this codec serves the beyond-reference multimodal column suite.
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared constants ---------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8x8 DCT-II basis: F = C @ f @ C.T, f = C.T @ F @ C
_C = np.array([
    [(np.sqrt(1 / 8) if u == 0 else 0.5)
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])

# simple flat-ish quality-50-style quant tables (the values need not match
# any canonical table — DQT carries them in-stream, so decode is exact)
_QT_LUMA = np.full(64, 16, dtype=np.int64)
_QT_LUMA[0] = 8
_QT_CHROMA = np.full(64, 24, dtype=np.int64)
_QT_CHROMA[0] = 12


# -- bit I/O ------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over an already byte-unstuffed segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0       # bit position
        self.nbits = len(data) * 8

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise NotImplementedError("jpeg: truncated entropy segment")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:   # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n   # pad with 0s (decoder never reads them)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# -- Huffman ------------------------------------------------------------------

def _build_huff(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """DHT (16 length counts + symbol list) -> {(length, code): symbol},
    canonical code assignment per T.81 Annex C."""
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


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("jpeg: invalid huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1: map a `size`-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _bit_size(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _magnitude(v: int, size: int) -> int:
    """Inverse of _extend: signed value -> `size`-bit code."""
    return v if v >= 0 else v + (1 << size) - 1


# -- decoder ------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, C) uint8 (C=1 grayscale, C=3 RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("jpeg: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> table
    frame = None   # (h, w, comps) ; comps = [(cid, hi, vi, tq)]
    restart = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise NotImplementedError("jpeg: marker desync")
        marker = payload[i + 1]
        if marker == 0xD9:   # EOI
            break
        seg_len = struct.unpack_from(">H", payload, i + 2)[0]
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:   # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                syms = seg[p + 17 : p + 17 + nsym]
                huff[(tc, th)] = _build_huff(counts, syms)
                p += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"jpeg: precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq_ = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq_))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: only baseline SOF0 supported (got SOF {marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows the header
            scan_comps = []
            ns = seg[0]
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tables >> 4, tables & 15))
            data_start = i + 2 + seg_len
            return _decode_scan(
                payload, data_start, frame, scan_comps, qt, huff, restart
            )
        # APPn / COM / DNL etc: skip
        i += 2 + seg_len
    raise NotImplementedError("jpeg: no SOS marker")


def _split_ecs(payload: bytes, start: int) -> list[bytes]:
    """Entropy-coded data from `start` to EOI, split at RSTn markers, each
    segment byte-unstuffed (FF 00 -> FF)."""
    segs = []
    cur = bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF and i + 1 < n:
            m = payload[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:   # restart marker
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break   # EOI or next real marker
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs


def _decode_scan(payload, start, frame, scan_comps, qt, huff, restart):
    if frame is None:
        raise NotImplementedError("jpeg: SOS before SOF0")
    h, w, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"jpeg: {len(comps)} components")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    # per-component pixel planes at full sampling-grid resolution
    planes = {
        cid: np.zeros((mcuy * vi * 8, mcux * hi * 8))
        for cid, hi, vi, _ in comps
    }
    segs = _split_ecs(payload, start)
    mcu_per_seg = restart if restart else mcux * mcuy
    mcu = 0
    for seg in segs:
        if mcu >= mcux * mcuy:
            break
        r = _BitReader(seg)
        pred = {cid: 0 for cid, *_ in comps}   # DC predictors reset at RST
        for _ in range(min(mcu_per_seg, mcux * mcuy - mcu)):
            my, mx = divmod(mcu, mcux)
            for cs, td, ta in scan_comps:
                cid, hi, vi, tq_ = by_id[cs]
                dc_tbl, ac_tbl = huff[(0, td)], huff[(1, ta)]
                for v in range(vi):
                    for u in range(hi):
                        blk = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(r, dc_tbl)
                        diff = _extend(r.read_bits(size), size)
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(r, ac_tbl)
                            if sym == 0x00:   # EOB
                                break
                            if sym == 0xF0:   # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            sz = sym & 15
                            if k > 63:
                                raise NotImplementedError("jpeg: AC overflow")
                            blk[k] = _extend(r.read_bits(sz), sz)
                            k += 1
                        coef = (blk * qt[tq_])[UNZIGZAG].reshape(8, 8)
                        pix = _C.T @ coef @ _C + 128.0
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + u) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu += 1
    # upsample each component to the full image grid and crop
    out_planes = []
    for cid, hi, vi, _ in comps:
        p = planes[cid]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, 0), hmax // hi, 1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -- encoder ------------------------------------------------------------------

def _encode_blocks(plane: np.ndarray, q: np.ndarray) -> list[np.ndarray]:
    """Pad-to-8 plane -> list of 64-long zigzagged quantized coef vectors."""
    hh, ww = plane.shape
    ph, pw = -(-hh // 8) * 8, -(-ww // 8) * 8
    padded = np.pad(plane.astype(np.float64), ((0, ph - hh), (0, pw - ww)),
                    mode="edge") - 128.0
    out = []
    for y0 in range(0, ph, 8):
        for x0 in range(0, pw, 8):
            coef = _C @ padded[y0 : y0 + 8, x0 : x0 + 8] @ _C.T
            zz = np.round(coef.reshape(64)[ZIGZAG] / q).astype(np.int64)
            out.append(zz)
    return out


def _block_syms(zz: np.ndarray) -> tuple[int, list[tuple[int, int, int]]]:
    """-> (dc_value, [(ac_symbol, extra_value, extra_bits)]). DC differencing
    happens in the MCU walk, where restart boundaries are known."""
    ac: list[tuple[int, int, int]] = []
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac.append((0xF0, 0, 0))
            run -= 16
        sz = _bit_size(v)
        ac.append(((run << 4) | sz, _magnitude(v, sz), sz))
        run = 0
    if last < 63:
        ac.append((0x00, 0, 0))
    return int(zz[0]), ac


def _canonical_9bit(symbols: set[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """Every used symbol at code length 9 — trivially valid DHT material
    (<=256 symbols < 2^9 - 1, so the all-ones code is never assigned)."""
    syms = sorted(symbols)
    counts = [0] * 16
    counts[8] = len(syms)   # length 9
    enc = {s: (9, i) for i, s in enumerate(syms)}
    return counts, bytes(syms), enc


def encode_jpeg(
    img: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """(H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8 -> baseline JPEG.

    ``subsample=True`` emits 4:2:0 (Y at 2x2, chroma 2x2-averaged) to
    exercise the decoder's upsample path; default is 4:4:4.
    ``restart_interval=N`` emits DRI + RSTn markers every N MCUs (the
    camera-JPEG convention), exercising the decoder's restart path.
    """
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 2:
        img = img[..., None]
    h, w, nc = img.shape
    if nc == 3:
        r_, g_, b_ = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
        cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def _avg(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            comp_planes = [(1, 2, 2, 0, y), (2, 1, 1, 1, _avg(cb)),
                           (3, 1, 1, 1, _avg(cr))]
        else:
            comp_planes = [(1, 1, 1, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]
    elif nc == 1:
        comp_planes = [(1, 1, 1, 0, img[..., 0])]
    else:
        raise ValueError(f"encode_jpeg: {nc} channels")

    qts = {0: _QT_LUMA, 1: _QT_CHROMA}
    hmax = max(c[1] for c in comp_planes)
    vmax = max(c[2] for c in comp_planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad every component plane to its full MCU block grid, then reorder
    # blocks into interleaved MCU sequence
    streams = {}
    for cid, hi, vi, tq_, plane in comp_planes:
        gh, gw = mcuy * vi * 8, mcux * hi * 8
        ph, pw = plane.shape
        plane = np.pad(plane, ((0, gh - ph), (0, gw - pw)), mode="edge")
        blocks = _encode_blocks(plane, qts[tq_])
        bw = mcux * hi   # blocks per row in this component's grid
        order = []
        for my in range(mcuy):
            for mx in range(mcux):
                for v in range(vi):
                    for u in range(hi):
                        order.append((my * vi + v) * bw + mx * hi + u)
        streams[cid] = [blocks[i] for i in order]

    # per-block symbols; DC diffs applied during the MCU walk below
    blk_syms = {cid: [_block_syms(b) for b in streams[cid]] for cid in streams}

    def _walk(emit_dc, emit_ac, on_restart):
        """One interleaved pass over all MCUs (restart-aware)."""
        pred = {cid: 0 for cid in streams}
        cursor = {cid: 0 for cid in streams}
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                pred = {cid: 0 for cid in streams}
                on_restart((m // restart_interval - 1) % 8)
            for cid, hi, vi, _tq, _pl in comp_planes:
                for _ in range(hi * vi):
                    dc, acs = blk_syms[cid][cursor[cid]]
                    cursor[cid] += 1
                    diff = dc - pred[cid]
                    pred[cid] = dc
                    sz = _bit_size(diff)
                    emit_dc(sz, _magnitude(diff, sz))
                    for s, extra, nbits in acs:
                        emit_ac(s, extra, nbits)

    # pass 1: collect used symbols -> minimal valid canonical tables
    dc_used: set[int] = set()
    ac_used: set[int] = set()
    _walk(lambda sz, _mag: dc_used.add(sz),
          lambda s, _e, _n: ac_used.add(s), lambda _m: None)
    dc_counts, dc_symlist, dc_enc = _canonical_9bit(dc_used)
    ac_counts, ac_symlist, ac_enc = _canonical_9bit(ac_used)

    # pass 2: huffman-encode
    wtr = _BitWriter()
    pieces: list[bytes] = []

    def _emit_dc(sz, mag):
        ln, code = dc_enc[sz]
        wtr.write(code, ln)
        if sz:
            wtr.write(mag, sz)

    def _emit_ac(s, extra, nbits):
        ln, code = ac_enc[s]
        wtr.write(code, ln)
        if nbits:
            wtr.write(extra, nbits)

    def _emit_rst(m):
        pieces.append(wtr.flush())
        pieces.append(bytes([0xFF, 0xD0 + m]))
        wtr.out = bytearray()

    _walk(_emit_dc, _emit_ac, _emit_rst)
    pieces.append(wtr.flush())
    scan = b"".join(pieces)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq_, tbl in qts.items():
        out += seg(0xDB, bytes([tq_]) + bytes(int(x) for x in tbl))
    sof = struct.pack(">BHHB", 8, h, w, len(comp_planes))
    for cid, hi, vi, tq_, _pl in comp_planes:
        sof += bytes([cid, (hi << 4) | vi, tq_])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_symlist)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_symlist)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comp_planes)])
    for cid, *_ in comp_planes:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)
