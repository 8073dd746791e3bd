"""Minimal, dependency-free PNG codec (numpy + stdlib zlib).

The engine treats images as opaque ``binary`` columns and decodes them
inside Arrow-batched UDFs (analog of the reference's WAV decode,
``/root/reference/wavio.py:37-73``).  PIL/imageio are not available in
this container, so we implement the lossless path ourselves: 8-bit
grayscale (colortype 0) and 8-bit RGB (colortype 2) PNGs, all five
standard scanline filters on decode, filter 0 on encode.

This is a real, spec-conformant PNG subset — output is readable by any
PNG viewer — sufficient for deterministic synthetic fixtures and for
exercising the decode-UDF plumbing at scale.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode a uint8 array of shape (h, w) or (h, w, 3) to PNG bytes."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 pixels")
    if pixels.ndim == 2:
        colortype, channels = 0, 1
        h, w = pixels.shape
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        colortype, channels = 2, 3
        h, w = pixels.shape[:2]
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = pixels.reshape(h, w * channels)
    # filter byte 0 (None) prepended to every scanline
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw], axis=1
    ).tobytes()
    idat = zlib.compress(scanlines, level=6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4). Row-sequential by spec."""
    rows = data.reshape(h, stride + 1)
    # fast path: all-None filters (what our own encoder emits) need no
    # sequential reconstruction — one vectorized slice
    if not rows[:, 0].any():
        return rows[:, 1:].copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = cur
        elif ftype == 1:  # Sub
            rec = cur.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = (cur + prior) & 0xFF
        elif ftype == 3:  # Average
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = cur.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = int(out[y - 1, x - bpp]) if (x >= bpp and y > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes (8-bit gray or RGB, non-interlaced) to uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = colortype = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0 or colortype not in (0, 2):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    channels = 1 if colortype == 0 else 3
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG size mismatch")
    px = _unfilter(raw, h, stride, channels)
    return px.reshape(h, w) if channels == 1 else px.reshape(h, w, 3)
