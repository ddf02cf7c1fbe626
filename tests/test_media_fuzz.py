"""Adversarial fuzz grid for the media/WARC surface (round-9 verdict
item 5): truncated payloads, lying magic bytes, corrupt IDAT/entropy
streams, bit flips, random garbage, and malformed WARC framing. The
contract under test: every decode kernel DEGRADES (returns None / a
quarantine row / an empty iterator) and NEVER raises — a crawled
corpus contains every one of these shapes, and one raising payload
kills a 100 TB ingest stage."""

from __future__ import annotations

import random
import zlib

import numpy as np
import pytest

from tcga_query_project_spark.operators import codecs, jpeg
from tcga_query_project_spark.sources import warc


def _valid_payloads() -> dict[str, bytes]:
    """One valid payload per codec, built with the repo's own
    encoders — the mutation bases."""
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(12, 10, 3)).astype(np.uint8)
    samples = np.sin(np.linspace(0, 20, 400)).astype(np.float64)
    return {
        "bmp": codecs.encode_bmp(rgb),
        "ppm": codecs.encode_ppm(rgb),
        "png": codecs.encode_png(rgb),
        "jpeg": jpeg.encode_jpeg(rgb, quality=80),
        "wav": codecs.encode_wav(8000, samples),
    }


def _mutations(payload: bytes, seed: int) -> list[bytes]:
    """Deterministic adversarial variants of one valid payload."""
    rnd = random.Random(seed)
    n = len(payload)
    muts: list[bytes] = [
        b"",  # empty
        payload[:1],
        payload[: n // 4],  # header survives, body gone
        payload[: n // 2],
        payload[:-1],  # one byte short of valid
        payload + b"\x00" * 7,  # trailing garbage
        payload[n // 4 :],  # magic gone, body intact
        b"\x00" * n,  # zeros with the right length
        bytes(rnd.randrange(256) for _ in range(n)),  # pure noise
    ]
    # lying magic: every other codec's signature stapled onto this body
    for magic in (b"BM", b"P6\n", b"\x89PNG\r\n\x1a\n",
                  b"\xff\xd8\xff\xe0", b"RIFF"):
        muts.append(magic + payload[len(magic):])
    # bit flips sprinkled through header, middle, and tail
    for pos in {1, n // 8, n // 2, n - 2} & set(range(n)):
        b = bytearray(payload)
        b[pos] ^= 0xFF
        muts.append(bytes(b))
    return muts


def test_image_and_audio_decoders_never_raise_on_fuzzed_bytes():
    valid = _valid_payloads()
    decoders = [
        codecs.decode_bmp,
        codecs.decode_ppm,
        codecs.decode_png,
        jpeg.decode_jpeg,
        codecs.decode_image,
        codecs.decode_wav,
    ]
    for name, payload in valid.items():
        for i, mut in enumerate(_mutations(payload, seed=hash(name) & 0xFFFF)):
            for dec in decoders:
                out = dec(mut)  # must not raise
                if out is None:
                    continue
                if dec is codecs.decode_wav:
                    rate, samples = out
                    assert rate > 0 and samples.ndim == 1
                else:
                    assert out.ndim == 3 and out.shape[2] == 3, (
                        name, i, dec.__name__, out.shape)


def test_corrupt_idat_and_entropy_streams_degrade():
    valid = _valid_payloads()
    # PNG: valid container framing around a broken zlib stream — the
    # chunk CRC walk succeeds, inflate must fail cleanly
    png = bytearray(valid["png"])
    idat = bytes(png).find(b"IDAT")
    assert idat > 0
    corrupted = bytearray(valid["png"])
    for off in range(idat + 4, min(idat + 24, len(corrupted))):
        corrupted[off] ^= 0xA5
    assert codecs.decode_png(bytes(corrupted)) is None
    # PNG: valid zlib stream holding garbage (wrong decompressed size)
    head = valid["png"][: valid["png"].find(b"IDAT") - 4]
    bad_stream = zlib.compress(b"\x07" * 11)
    chunk = b"IDAT" + bad_stream
    crc = zlib.crc32(chunk) & 0xFFFFFFFF
    fake = (head + len(bad_stream).to_bytes(4, "big") + chunk
            + crc.to_bytes(4, "big")
            + (0).to_bytes(4, "big") + b"IEND"
            + (zlib.crc32(b"IEND") & 0xFFFFFFFF).to_bytes(4, "big"))
    assert codecs.decode_png(bytes(fake)) is None
    # JPEG: flip bytes inside the entropy-coded scan (after SOS)
    jp = bytearray(valid["jpeg"])
    sos = bytes(jp).find(b"\xff\xda")
    assert sos > 0
    for off in range(sos + 14, min(sos + 40, len(jp) - 2)):
        jp[off] ^= 0x55
    out = jpeg.decode_jpeg(bytes(jp))  # must not raise
    assert out is None or (out.ndim == 3 and out.shape[2] == 3)


def test_decoders_reject_dimension_lies():
    # BMP header claiming absurd dimensions over a tiny body must not
    # allocate terabytes or raise — width/height words live at 18/22
    bmp = bytearray(_valid_payloads()["bmp"])
    bmp[18:22] = (2**31 - 1).to_bytes(4, "little")
    assert codecs.decode_bmp(bytes(bmp)) is None
    bmp2 = bytearray(_valid_payloads()["bmp"])
    bmp2[22:26] = (2**31 - 1).to_bytes(4, "little")
    assert codecs.decode_bmp(bytes(bmp2)) is None
    # PPM claiming more pixels than the body carries
    ppm = b"P6\n10000 10000\n255\n" + b"\x10" * 30
    assert codecs.decode_ppm(ppm) is None


def _valid_warc() -> bytes:
    body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html><body>hello world</body></html>")
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: http://example.com/\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n"
           b"\r\n" + body + b"\r\n\r\n")
    return rec * 3


def test_warc_parser_survives_malformed_framing():
    valid = _valid_warc()
    cases = [
        b"",
        b"WARC/1.0",  # bare magic, no headers
        b"WARC/1.0\r\n\r\n",  # no content-length
        b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\n",
        b"WARC/1.0\r\nContent-Length: -5\r\n\r\nxxxxx",  # hostile length
        b"WARC/1.0\r\nContent-Length: 999999\r\n\r\nshort",  # lying length
        valid[: len(valid) // 2],  # truncated mid-record
        valid.replace(b"WARC/1.0", b"WARC/9.9"),
        b"garbage before " + valid + b" garbage after",
        valid.replace(b"\r\n", b"\n"),  # LF-only framing
        bytes(random.Random(5).randrange(256) for _ in range(4096)),
    ]
    for i, data in enumerate(cases):
        # must terminate and never raise; every yielded record is typed
        recs = list(warc.parse_warc_records(data))
        for headers, payload in recs:
            assert isinstance(headers, dict) and isinstance(payload, bytes)
        if data == valid[: len(valid) // 2]:
            assert len(recs) >= 1  # leading intact record still parses


def test_warc_gzip_members_survive_corruption():
    import gzip

    valid = _valid_warc()
    gz = gzip.compress(valid)
    for data in [gz[: len(gz) // 2], gz[:-4], b"\x1f\x8b" + b"\x00" * 50,
                 gz + b"\x1f\x8b\x08trailing-junk"]:
        recs = list(warc.parse_warc_records(data))  # must not raise
        for headers, payload in recs:
            assert isinstance(payload, bytes)


def test_split_http_response_on_garbage():
    for payload in [b"", b"\r\n\r\n", b"HTTP/1.1", b"no headers here",
                    b"HTTP/1.1 200 OK\r\nbroken", b"\x00" * 64]:
        headers, body = warc.split_http_response(payload)
        assert isinstance(headers, dict) and isinstance(body, bytes)


def test_spark_feature_kernel_quarantines_corrupt_payloads(spark):
    """End-to-end mapInPandas pass over a half-corrupt media table:
    every row yields a feature row (corrupt payloads fall back to the
    byte histogram — deterministic, total), no task failure."""
    from tcga_query_project_spark.operators.multimodal import (
        extract_features,
        validate_media,
    )

    valid = _valid_payloads()
    rows, rid = [], 0
    for name, payload in valid.items():
        rows.append((rid, name, "image/" + name, bytearray(payload)))
        rid += 1
        for mut in _mutations(payload, seed=rid)[:6]:
            rows.append((rid, name, "image/" + name, bytearray(mut)))
            rid += 1
    media = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, payload binary"
    )
    feats = extract_features(media).collect()
    assert len(feats) == len(rows)
    for r in feats:
        assert len(r["feature"]) == 32
        assert all(v == v for v in r["feature"])  # no NaN
    # the ingest gate flags lying magic without touching Python
    flags = validate_media(media).collect()
    assert len(flags) == len(rows)
    assert any(not r["mime_ok"] for r in flags)
