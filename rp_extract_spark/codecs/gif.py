"""GIF87a/89a codec — pure-Python LZW, numpy output.

Fourth real still-image format (web corpora are full of GIFs): logical
screen + color tables, extension-block skipping, variable-width LSB-
first LZW with dictionary reset, and 4-pass deinterlacing, implemented
from the public GIF specification. Decodes the FIRST image block
(animation frames beyond the first are a demux concern, like video).

The encoder writes the classic "uncompressed GIF": every pixel emitted
as a literal code with a Clear code issued before the dictionary would
outgrow the initial width — spec-valid output any GIF reader accepts
(interop-tested against javax.imageio).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode uint8 grayscale (h, w) with a 256-entry gray palette."""
    if pixels.dtype != np.uint8 or pixels.ndim != 2:
        raise ValueError("encode_gif expects 2-D uint8 pixels")
    h, w = pixels.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out += bytes([8])  # LZW min code size

    # uncompressed LZW: 9-bit literals with a Clear before the table
    # would exceed 9 bits (after 254 emitted codes)
    CLEAR, EOI = 256, 257
    acc = 0
    nbits = 0
    data = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first
        nbits += 9
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(CLEAR)
    count = 0
    for px in pixels.ravel():
        if count == 254:  # next dict entry would need 10 bits
            emit(CLEAR)
            count = 0
        emit(int(px))
        count += 1
    emit(EOI)
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first image of a GIF to (h, w, 3) RGB (or (h, w)
    gray when the palette is pure grayscale)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt GIF: {e!r}") from e


def _read_color_table(data: bytes, pos: int, flags: int) -> tuple:
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        if table.size < 3 * n:
            raise ValueError("truncated GIF color table")
        return table.reshape(n, 3), pos + 3 * n
    return None, pos


def _decode_gif(data: bytes) -> np.ndarray:
    w_s, h_s, flags = struct.unpack_from("<HHB", data, 6)
    pos = 13
    gct, pos = _read_color_table(data, pos, flags)
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        lct, pos = _read_color_table(data, pos, iflags)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF image without color table")
        min_code = data[pos]
        pos += 1
        stream = bytearray()
        while data[pos] != 0:
            n = data[pos]
            stream += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        indices = _lzw_decode(bytes(stream), min_code, w * h)
        idx = np.frombuffer(bytes(indices), dtype=np.uint8)
        if idx.size < w * h:
            raise ValueError("GIF pixel data short")
        img_idx = idx[: w * h].reshape(h, w)
        if iflags & 0x40:  # interlaced: rows stored in 4 passes — map back
            ordered = np.empty((h, w), dtype=np.uint8)
            src = 0
            for start, step in _DEINTERLACE:
                for y in range(start, h, step):
                    ordered[y] = img_idx[src]
                    src += 1
            img_idx = ordered
        rgb = palette[np.clip(img_idx, 0, palette.shape[0] - 1)]
        if (rgb[..., 0] == rgb[..., 1]).all() and (rgb[..., 1] == rgb[..., 2]).all():
            return rgb[..., 0].copy()
        return rgb
    raise ValueError("GIF contains no image block")


def _lzw_decode(stream: bytes, min_code: int, max_pixels: int) -> bytearray:
    """Variable-width LSB-first LZW (GIF flavor)."""
    CLEAR = 1 << min_code
    EOI = CLEAR + 1
    base = [bytes([i]) for i in range(CLEAR)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    out = bytearray()
    for byte in stream:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == CLEAR:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == EOI:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW code")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= max_pixels:
                return out
    return out
