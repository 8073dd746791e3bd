"""Codec tests: PNG round-trip, lossy stub PSNR gate, format dispatch."""

import numpy as np
import pytest

from rp_extract_spark.codecs import (
    decode_image,
    decode_png,
    encode_lossy,
    encode_png,
    psnr,
    to_gray,
)

rng = np.random.default_rng(42)


def test_png_roundtrip_gray():
    px = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_roundtrip_rgb():
    px = rng.integers(0, 256, size=(33, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_all_filters_decode():
    # hand-build a PNG using each filter type per row and check decode
    import struct
    import zlib

    from rp_extract_spark.codecs.png import _PNG_SIG, _chunk

    h, w = 5, 8
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    # encode with filters 0..4 (one per row), computing filtered bytes
    lines = []
    prior = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = px[y].astype(np.int32)
        f = y % 5
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - np.concatenate([[0], cur[:-1]])
        elif f == 2:
            enc = cur - prior
        elif f == 3:
            left = np.concatenate([[0], cur[:-1]])
            enc = cur - ((left + prior) >> 1)
        else:
            left = np.concatenate([[0], cur[:-1]])
            ul = np.concatenate([[0], prior[:-1]])
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul))
            enc = cur - pred
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)


def test_lossy_psnr_gate():
    px = rng.integers(0, 256, size=(64, 96), dtype=np.uint8)
    dec = decode_image(encode_lossy(px), "jpeg")
    assert dec.shape == px.shape
    assert psnr(px, dec) >= 40.0  # BASELINE.json input_hint gate


def test_lossless_psnr_inf():
    px = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    assert psnr(px, decode_image(encode_png(px), "png")) == float("inf")


def test_decode_dispatch_errors():
    with pytest.raises(ValueError):
        decode_image(b"", "png")
    with pytest.raises(ValueError):
        decode_image(b"notapng", "png")
    with pytest.raises(ValueError):
        # real-JPEG magic but truncated stream → parse error, not stub
        decode_image(b"\xff\xd8\xff\xe0realjpegheader", "jpeg")
    with pytest.raises(ValueError):
        decode_image(b"ZZZZnot-a-jpeg", "jpeg")


def test_to_gray_channel_mean():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[..., 0] = 30
    px[..., 1] = 60
    px[..., 2] = 90
    assert np.allclose(to_gray(px), 60.0)


def test_bmp_roundtrip_gray_and_rgb():
    from rp_extract_spark.codecs.bmp import decode_bmp, encode_bmp

    g = rng.integers(0, 256, (19, 33), dtype=np.uint8)  # odd width -> padding
    assert np.array_equal(decode_bmp(encode_bmp(g)), g)
    c = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(c)), c)
    # dispatch
    assert np.array_equal(decode_image(encode_bmp(g), "bmp"), g)


def test_bmp_rejects_bad_input():
    from rp_extract_spark.codecs.bmp import decode_bmp, encode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"NOPE")
    g = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    data = encode_bmp(g)
    with pytest.raises(ValueError):
        decode_bmp(data[: len(data) // 2])
