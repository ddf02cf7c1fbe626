"""Pure-python media codecs for the multimodal kernels.

Real decode/encode for the container formats that need no native
library — BMP (24/32-bit uncompressed), PPM/PGM (binary P6/P5), PNG
(8-bit non-interlaced, stdlib ``zlib`` inflate + RFC 2083 unfiltering),
baseline JPEG (``operators/jpeg``: markers, canonical Huffman, numpy
IDCT — dispatched from :func:`decode_image`) and WAV (PCM 8/16-bit,
via the stdlib ``wave`` module) — plus a nearest-neighbor resize
kernel. These are the "real codec" leg of operators/multimodal.py:
payloads in these formats decode to actual pixels/samples; anything
else (MP3, MP4 — full AV stacks) falls back to the documented
deterministic byte-level stand-ins there.

Everything here is driver-importable but designed to run inside Arrow
``mapInPandas`` batches on executors: pure functions over ``bytes`` in,
numpy arrays out, no state, no I/O.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

#: Upper bound on DECLARED pixel counts the decoders will allocate for
#: (~64 Mpx ≈ a 8192x8192 image; RGBA int64 working arrays at that size
#: are ~2 GB — the ceiling of what one Arrow-batch task should ever
#: hold). Headers are attacker-controlled in crawl data: PNG/JPEG
#: payload bytes are COMPRESSED, so a tiny payload can declare a huge
#: canvas; every decoder must bounds-check the header before
#: allocating, returning the documented None instead of OOM-killing
#: the executor.
MAX_DECODE_PIXELS = 64 * 1024 * 1024

# --------------------------------------------------------------------------
# images: BMP + PPM/PGM
# --------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Decode an uncompressed (BI_RGB) 24- or 32-bit BMP into an RGB
    uint8 array of shape (height, width, 3); None if the payload is not
    such a BMP. Handles 4-byte row padding, bottom-up (positive height)
    and top-down (negative height) row orders."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        data_offset = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:  # BITMAPCOREHEADER etc. — not supported
            return None
        width, height = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
    except struct.error:
        return None
    if planes != 1 or compression != 0 or bpp not in (24, 32) or width <= 0:
        return None
    top_down = height < 0
    height = abs(height)
    if height == 0:
        return None
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    need = data_offset + row_stride * height
    if len(payload) < need:
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_stride * height,
                        offset=data_offset)
    rows = raw.reshape(height, row_stride)[:, : width * bytes_pp]
    px = rows.reshape(height, width, bytes_pp)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A); emit RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up, rows padded to 4 bytes) — byte-exact inverse of
    :func:`decode_bmp` for 24-bit inputs."""
    h, w, _ = rgb.shape
    row_stride = (w * 3 + 3) & ~3
    img_size = row_stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    return header + rows.tobytes()


def _ppm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers from a PNM header
    starting at ``start`` (comments ``#..\\n`` skipped); returns the
    values and the offset just past the single whitespace that
    terminates the last one."""
    vals: list[int] = []
    i = start
    while len(vals) < n and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            break
    if len(vals) < n or i >= len(payload) or not payload[i : i + 1].isspace():
        return vals, -1
    return vals, i + 1  # consume exactly one whitespace after maxval


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Decode a binary PPM (P6, RGB) or PGM (P5, grayscale — replicated
    to 3 channels) with maxval ≤ 255 into (H, W, 3) uint8; None
    otherwise."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in b"56":
        return None
    channels = 3 if payload[1:2] == b"6" else 1
    (dims, off) = _ppm_tokens(payload, 3, 2)
    if off < 0:
        return None
    w, h, maxval = dims
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        return None
    need = w * h * channels
    if len(payload) < off + need:
        return None
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off).reshape(
        h, w, channels
    )
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


def encode_ppm(rgb: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as binary PPM (P6, maxval 255)."""
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray | None:
    """Decode an 8-bit non-interlaced PNG (color types 0 gray, 2
    truecolor, 3 palette, 4 gray+alpha, 6 RGBA) into (H, W, 3) uint8
    RGB — stdlib ``zlib`` inflate of the concatenated IDAT stream plus
    per-row unfiltering (None/Sub/Up/Average/Paeth, RFC 2083 §6); alpha
    is dropped, gray replicated. None for malformed payloads, 16-bit,
    interlaced, or unknown color types.

    The most common real-corpus image container that needs no native
    library: DEFLATE ships in CPython. Sub/Up unfilter vectorize per
    row; Average/Paeth fall back to a per-pixel loop (their recurrence
    is inherently sequential in x)."""
    if payload[:8] != _PNG_MAGIC:
        return None
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) < length:
                return None
            pos += 12 + length  # length + type + data + crc (unchecked)
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                plte = np.frombuffer(data, dtype=np.uint8)
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
        if ihdr is None or not idat:
            return None
        w, h, depth, color, comp, filt, interlace = ihdr
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
        if channels is None or w <= 0 or h <= 0:
            return None
        # Adversarial-input guards (crawl data is untrusted): reject
        # implausible DECLARED dimensions before touching the DEFLATE
        # stream, and inflate with an output bound — a small
        # decompression-bomb IDAT must hit the documented return-None
        # path, not exhaust executor memory (the size check used to
        # run only AFTER full inflation).
        if w * h > MAX_DECODE_PIXELS:
            return None
        stride = w * channels
        need = h * (stride + 1)
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), need)
    except Exception:
        return None
    if len(raw) < h * (stride + 1):
        return None
    scan = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    filters = scan[:, 0]
    rows = scan[:, 1:].astype(np.int64)
    bpp = channels  # 8-bit: bytes per pixel == channels
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = filters[y]
        r = rows[y]
        if f == 0:
            cur = r
        elif f == 1:  # Sub: cumulative along x with lag bpp
            cur = r.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (r + prev) & 0xFF
        elif f == 3:  # Average
            cur = r.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = r.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                cur[x] = (cur[x] + pr) & 0xFF
        else:
            return None
        out[y] = cur
        prev = cur
    px = out.astype(np.uint8).reshape(h, w, channels)
    if color == 3:  # palette lookup
        if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
            return None
        pal = plte.reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max()) >= pal.shape[0]:
            return None
        return np.ascontiguousarray(pal[idx])
    if channels == 1:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if channels == 2:  # gray + alpha → replicate gray
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    if channels == 4:  # RGBA → drop alpha
        return np.ascontiguousarray(px[:, :, :3])
    return np.ascontiguousarray(px)


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as an 8-bit truecolor non-interlaced
    PNG (filter 0 on every row, one IDAT) — a valid inverse of
    :func:`decode_png` usable anywhere PNG bytes are expected."""
    h, w, _ = rgb.shape
    scan = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    scan[:, 1:] = rgb.reshape(h, w * 3)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray | None:
    """Dispatch on magic bytes: BMP, PPM/PGM, PNG or baseline JPEG →
    (H, W, 3) uint8 RGB; None for every other (or malformed)
    payload."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:1] == b"P" and payload[1:2] in b"56":
        return decode_ppm(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from tcga_query_project_spark.operators import jpeg

        return jpeg.decode_jpeg(payload)
    return None


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) to (height, width, C) — one
    numpy gather, the deterministic baseline kernel (PIL/OpenCV swap in
    for higher-quality filters without changing the dataflow)."""
    h, w = rgb.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return np.ascontiguousarray(rgb[rows][:, cols])


# --------------------------------------------------------------------------
# audio: WAV (PCM)
# --------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Decode a PCM WAV payload to (sample_rate, mono float64 samples in
    [-1, 1]); multi-channel input is mean-downmixed. Supports 8-bit
    unsigned and 16-bit signed PCM (the stdlib ``wave`` reader); None
    for anything else."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            rate = f.getframerate()
            n_ch = f.getnchannels()
            width = f.getsampwidth()
            frames = f.readframes(f.getnframes())
    except (wave.Error, EOFError):
        return None
    if rate <= 0 or n_ch <= 0:
        return None  # corrupt fmt chunk the stdlib reader let through
    # a truncated data chunk can end mid-sample: clip to whole samples
    # instead of letting frombuffer raise on a ragged buffer
    frames = frames[: (len(frames) // width) * width] if width else b""
    if width == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    else:
        return None
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return rate, x


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """Encode mono float samples in [-1, 1] as 16-bit PCM WAV."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm16.tobytes())
    return buf.getvalue()
