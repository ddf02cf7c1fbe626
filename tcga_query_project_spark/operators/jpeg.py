"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure python + numpy.

The "real codec" leg of operators/multimodal for the second of the two
formats real corpora are mostly made of (PNG landed in round 6's
codecs.py): no native library — marker parsing, canonical Huffman
tables, zigzag/dequantize, and an exact orthonormal 8×8 IDCT as one
numpy einsum per block batch.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr
with ANY sampling factors (4:4:4, 4:2:0, 4:2:2 — the MCU walk is
driven by the declared h×v factors), byte-stuffing and RSTn restart
markers. Progressive (SOF2), arithmetic coding and 12-bit return None
— fall through to the byte-level stand-in, never raise.

Encoder: single-scan interleaved baseline, 4:4:4 (no subsampling),
Annex K quantization tables scaled by ``quality``, Annex K "typical"
Huffman tables — a conservative, maximally-compatible JFIF writer.

Python-loop budget: the entropy decode is inherently sequential (one
Huffman symbol at a time) and runs as a per-symbol python loop; the
DCT/IDCT, dequantize, upsample and color transforms are whole-plane
numpy. Inside Arrow ``mapInPandas`` batches this prices at the media
kernel, not the row count — swap PIL/libjpeg in for production speed
without changing any dataflow (same decode_image dispatch).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared tables
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 — luminance / chrominance quantization tables
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K.3 "typical" Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8×8 DCT-II matrix: dct = C @ block @ C.T, idct = C.T @ .. @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, int]:
    """(length << 16 | code) → symbol, per T.81 canonical assignment."""
    table: dict[int, int] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length << 16) | code] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), the encoder-side view."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; RSTn markers reset DC predictors (handled by caller via
    ``at_marker``/``skip_marker``)."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bit = 0

    def _byte(self) -> int:
        return self.data[self.pos]

    def read_bit(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise EOFError
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    pass  # stuffed FF — consume normally
                else:
                    raise EOFError  # a real marker: caller handles
            break
        bit = (d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if self.pos < len(d) and d[self.pos - 1] == 0xFF and d[self.pos] == 0x00:
                self.pos += 1  # skip the stuffing zero
        return bit

    def at_marker(self) -> int | None:
        """Marker byte if the reader sits at an 0xFF <marker> boundary."""
        if self.bit != 0:
            return None
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
            return d[self.pos + 1]
        return None

    def skip_marker(self) -> None:
        self.pos += 2
        self.bit = 0

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1
            d = self.data
            if (
                self.pos < len(d)
                and d[self.pos - 1] == 0xFF
                and d[self.pos] == 0x00
            ):
                self.pos += 1


def _huff_decode(r: _BitReader, table: dict[int, int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length << 16) | code)
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = 0
    for _ in range(size):
        v = (v << 1) | r.read_bit()
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Decode a baseline JFIF payload to (H, W, 3) uint8 RGB (grayscale
    replicated); None for progressive/arithmetic/12-bit/malformed."""
    if payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(d: bytes) -> np.ndarray | None:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[int, int]] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            return None
        marker = d[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack_from(">H", d, pos)
        seg = d[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.float64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.float64)
                    i += 128
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _canonical_codes(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                return None
            h, w = struct.unpack_from(">HH", seg, 1)
            # declared-dimension cap BEFORE any MCU-plane allocation:
            # the scan body is entropy-coded, so a tiny hostile payload
            # can declare a huge canvas (codecs.MAX_DECODE_PIXELS —
            # same guard as the PNG path)
            from tcga_query_project_spark.operators.codecs import (
                MAX_DECODE_PIXELS,
            )

            if h <= 0 or w <= 0 or h * w > MAX_DECODE_PIXELS:
                return None
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append(
                    {"comp": comp, "dc": tables >> 4, "ac": tables & 0xF}
                )
            return _decode_scan(
                d, pos + seg_len, frame, scan, qt, huff, restart_interval
            )
        elif marker == 0xD9:
            return None
        pos += seg_len
    return None


def _decode_scan(d, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["comp"]["h"] for c in scan)
    vmax = max(c["comp"]["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for s in scan:
        c = s["comp"]
        planes[c["id"]] = np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
    r = _BitReader(d, pos)
    pred = {s["comp"]["id"]: 0 for s in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align()
                m = r.at_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    r.skip_marker()
                    pred = {k: 0 for k in pred}
            for s in scan:
                c = s["comp"]
                dc_t = huff[(0, s["dc"])]
                ac_t = huff[(1, s["ac"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = _huff_decode(r, dc_t)
                        diff = _receive_extend(r, size)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC overflow")
                            zz[k] = _receive_extend(r, size)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz * q
                        px = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample each plane to full MCU-padded resolution, crop, transform
    full = []
    for s in scan:
        c = s["comp"]
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((table * s + 50) / 100.0)
    return np.clip(q, 1, 255)


def _size_cat(v: int) -> int:
    return int(v != 0 and int(abs(v)).bit_length())


def _encode_block(
    w: _BitWriter, blk: np.ndarray, q: np.ndarray, pred: int,
    dc_codes, ac_codes,
) -> int:
    coef = _C @ (blk - 128.0) @ _C.T
    zz = np.round(coef.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
    # DC
    diff = int(zz[0]) - pred
    size = _size_cat(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            w.write(c, ln)
            run -= 16
        size = _size_cat(v)
        c, ln = ac_codes[(run << 4) | size]
        w.write(c, ln)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]
        w.write(c, ln)
    return int(zz[0])


def _pad_to(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pad = np.empty((ph, pw))
    pad[:h, :w] = p
    pad[h:, :w] = p[h - 1 : h, :]
    pad[:, w:] = pad[:, w - 1 : w]
    return pad


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _huff_segments() -> bytes:
    out = bytearray()
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += _seg(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    return bytes(out)


def encode_jpeg(
    rgb: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode (H, W, 3) uint8 RGB as a baseline JFIF JPEG — Annex K
    tables scaled by ``quality``; ``subsampling`` is ``"444"`` (every
    component full resolution) or ``"420"`` (chroma 2×2-mean
    downsampled, 16×16 MCUs — the common camera/web layout, and the
    decoder's general MCU walk exercised end-to-end)."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling={subsampling!r}: use '444' or '420'")
    h, w = rgb.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    x = rgb.astype(np.float64)
    y = 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]
    cb = -0.168736 * x[:, :, 0] - 0.331264 * x[:, :, 1] + 0.5 * x[:, :, 2] + 128.0
    cr = 0.5 * x[:, :, 0] - 0.418688 * x[:, :, 1] - 0.081312 * x[:, :, 2] + 128.0
    sub = subsampling == "420"
    mcu = 16 if sub else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    yp = _pad_to(y, ph, pw)
    if sub:
        cbp = _pad_to(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
        crp = _pad_to(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
        y_hv, c_shift = 0x22, 1
    else:
        cbp, crp = _pad_to(cb, ph, pw), _pad_to(cr, ph, pw)
        y_hv, c_shift = 0x11, 0

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql.astype(np.uint8)[ZIGZAG]))
    out += _seg(0xDB, bytes([1]) + bytes(qc.astype(np.uint8)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, hv, tq in ((1, y_hv, 0), (2, 0x11, 1), (3, 0x11, 1)):
        sof += bytes([cid, hv, tq])
    out += _seg(0xC0, sof)
    out += _huff_segments()
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    wtr = _BitWriter()
    dc_l = _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _encode_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _encode_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    pred = [0, 0, 0]
    n_y = 2 if sub else 1  # luma blocks per MCU axis
    for my in range(ph // mcu):
        for mx in range(pw // mcu):
            for by in range(n_y):
                for bx in range(n_y):
                    y0, x0 = my * mcu + by * 8, mx * mcu + bx * 8
                    blk = yp[y0 : y0 + 8, x0 : x0 + 8]
                    pred[0] = _encode_block(wtr, blk, ql, pred[0], dc_l, ac_l)
            for ci, plane in ((1, cbp), (2, crp)):
                y0, x0 = (my * mcu) >> c_shift, (mx * mcu) >> c_shift
                blk = plane[y0 : y0 + 8, x0 : x0 + 8]
                pred[ci] = _encode_block(wtr, blk, qc, pred[ci], dc_c, ac_c)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray(gray: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W) uint8 grayscale array as a single-component
    baseline JFIF JPEG."""
    h, w = gray.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    yp = _pad_to(gray.astype(np.float64), ph, pw)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql.astype(np.uint8)[ZIGZAG]))
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _huff_segments()
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    wtr = _BitWriter()
    dc_l = _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    pred = 0
    for my in range(ph // 8):
        for mx in range(pw // 8):
            blk = yp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            pred = _encode_block(wtr, blk, ql, pred, dc_l, ac_l)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
