"""Deterministic lossy codec STUB (the container has no JPEG library).

The production design dispatches on the ``fmt`` column inside the decode
UDF (analog of the reference's decoder dispatch,
``/root/reference/audiofile_read.py:139-212``): ``png`` → lossless PNG,
``jpeg`` → a real JPEG decoder (PIL / libjpeg-turbo).  PIL is absent
here, so ``jpeg`` rows carry a clearly-marked deterministic *fake lossy*
encoding: pixels are quantized to step ``Q`` (simulating quantization
loss with a known PSNR floor) and wrapped in our PNG container with a
marker chunk.  Everything Spark-side (schema, UDF signature, batch
shape, PSNR gate) is real and tested; only the entropy-coding internals
are faked.  Swap `encode_lossy`/`decode_lossy` for PIL calls on a real
cluster.

PSNR math: uniform quantization with step Q has MSE ≈ (Q²-1)/12, so
Q=4 → PSNR ≈ 10·log10(255²/1.25) ≈ 47 dB, comfortably above the
40 dB gate from BASELINE.json's input_hint.
"""

from __future__ import annotations

import numpy as np

from .png import decode_png, encode_png

_MARKER = b"LQ01"  # prepended so fake-jpeg bytes are distinguishable
DEFAULT_Q = 4


def encode_lossy(pixels: np.ndarray, q: int = DEFAULT_Q) -> bytes:
    """Quantize uint8 pixels to step q and encode; deterministic."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_lossy expects uint8 pixels")
    quant = ((pixels.astype(np.int32) // q) * q + q // 2).clip(0, 255).astype(np.uint8)
    return _MARKER + encode_png(quant)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _MARKER:
        raise ValueError("not a fake-lossy payload")
    return decode_png(data[4:])


def is_lossy(data: bytes) -> bool:
    return data[:4] == _MARKER


def decode_real_jpeg(data: bytes) -> np.ndarray:
    """Real JPEG path — unavailable in this container by design."""
    raise NotImplementedError(
        "JPEG decode requires PIL/libjpeg which is not installed here; "
        "fixtures use the deterministic fake-lossy codec instead"
    )
