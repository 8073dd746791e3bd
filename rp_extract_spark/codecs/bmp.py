"""Uncompressed BMP (BITMAPINFOHEADER) codec — pure struct/numpy.

Third real still-image format next to PNG and JPEG: 8-bit grayscale
(palette) and 24-bit BGR, bottom-up rows, 4-byte row padding — the
classic Windows DIB layout, implemented from the public spec.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode uint8 gray (h, w) as 8-bit paletted BMP or (h, w, 3) RGB
    as 24-bit BMP."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects uint8 pixels")
    h, w = pixels.shape[:2]
    gray = pixels.ndim == 2
    bpp = 8 if gray else 24
    row_bytes = (w * (1 if gray else 3) + 3) & ~3
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256)) if gray else b""
    data_offset = 14 + 40 + len(palette)
    img_size = row_bytes * h
    header = struct.pack(
        "<2sIHHI", b"BM", data_offset + img_size, 0, 0, data_offset
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, img_size, 2835, 2835,
        256 if gray else 0, 0,
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        if gray:
            line = pixels[y].tobytes()
        else:
            line = pixels[y, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(line + b"\x00" * (row_bytes - len(line)))
    return header + palette + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode 8-bit paletted (returned as gray via the palette) or
    24-bit BMP."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP stream")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if compression != 0:
        raise ValueError("compressed BMP unsupported")
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    bottom_up = h > 0
    h = abs(h)
    if bpp == 8:
        n_colors = struct.unpack_from("<I", data, 14 + 32)[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off: pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)
        # gray value via integer-mean of BGR palette entries
        lut = pal[:, :3].astype(np.uint16).mean(axis=1).astype(np.uint8)
        row_bytes = (w + 3) & ~3
        raw = np.frombuffer(
            data[data_offset: data_offset + row_bytes * h], dtype=np.uint8
        )
        if raw.size < row_bytes * h:
            raise ValueError("truncated BMP pixel data")
        img = lut[raw.reshape(h, row_bytes)[:, :w]]
    elif bpp == 24:
        row_bytes = (w * 3 + 3) & ~3
        raw = np.frombuffer(
            data[data_offset: data_offset + row_bytes * h], dtype=np.uint8
        )
        if raw.size < row_bytes * h:
            raise ValueError("truncated BMP pixel data")
        img = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    return img[::-1].copy() if bottom_up else img.copy()
