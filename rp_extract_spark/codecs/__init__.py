"""Image codecs: pure-numpy PNG, pure-numpy baseline JPEG (real
entropy coding, ITU-T T.81), and the legacy fast fixture-lossy codec."""

from __future__ import annotations

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg
from .lossy import decode_lossy, encode_lossy, is_lossy
from .png import decode_png, encode_png

__all__ = [
    "decode_png",
    "encode_png",
    "decode_jpeg",
    "encode_jpeg",
    "decode_lossy",
    "encode_lossy",
    "decode_image",
    "psnr",
    "to_gray",
]


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch on fmt (analog of audiofile_read's format dispatch,
    /root/reference/audiofile_read.py:354-400). ``jpeg`` payloads
    dispatch on magic bytes: real JFIF streams (FF D8) go through the
    in-repo baseline JPEG decoder; the legacy fixture-lossy container
    (LQ01 marker) stays readable for persisted round-1 fixtures."""
    if data is None or len(data) == 0:
        raise ValueError("empty image payload")
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        if is_lossy(data):
            return decode_lossy(data)
        if data[:2] == b"\xff\xd8":
            return decode_jpeg(data)
        raise ValueError("jpeg payload has neither JFIF nor fixture marker")
    if fmt == "bmp":
        from .bmp import decode_bmp

        return decode_bmp(data)
    if fmt == "gif":
        from .gif import decode_gif

        return decode_gif(data)
    raise ValueError(f"unsupported image format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """Channel-mean mixdown (analog of stereo→mono,
    /root/reference/rp_extract.py:477-481: mean over channel axis)."""
    if pixels.ndim == 3:
        return pixels.mean(axis=2)
    return pixels.astype(np.float64)
