"""Pure-numpy RIFF/WAVE (PCM) codec.

The reference's primary input format (audiofile_read.py:53-93 wav_read
via scipy.io.wavfile). Implemented from the public RIFF spec: fmt/data
chunk parse, PCM 8/16/24/32-bit integer and 32-bit float payloads,
mono 1-D / multi-channel 2-D arrays, and the reference's normalization
rule ``wavedata / (2**(8*samplewidth)/2)``
(audiofile_read.py:44-50 normalize_wav).

No audio *compression* codec lives in the container (MP3/AAC need
ffmpeg — that dispatch stays an honest stub in operators/multimodal),
but WAV rows decode for real.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_FLOAT = 3


def encode_wav(
    samples: np.ndarray, samplerate: int, samplewidth: int = 2
) -> bytes:
    """Encode float samples in [-1, 1) (or already-integer samples) to
    a PCM WAV. ``samples``: 1-D mono or (n, channels) 2-D."""
    arr = np.asarray(samples)
    channels = 1 if arr.ndim == 1 else arr.shape[1]
    if samplewidth == 2:
        if np.issubdtype(arr.dtype, np.floating):
            arr = np.clip(np.round(arr * 32768.0), -32768, 32767)
        data = arr.astype("<i2").tobytes()
        fmt, bits = _PCM, 16
    elif samplewidth == 4:
        if np.issubdtype(arr.dtype, np.floating):
            data = arr.astype("<f4").tobytes()
            fmt, bits = _FLOAT, 32
        else:
            data = arr.astype("<i4").tobytes()
            fmt, bits = _PCM, 32
    elif samplewidth == 1:
        if np.issubdtype(arr.dtype, np.floating):
            arr = np.clip(np.round(arr * 128.0 + 128.0), 0, 255)
        data = arr.astype(np.uint8).tobytes()
        fmt, bits = _PCM, 8
    elif samplewidth == 3:
        if np.issubdtype(arr.dtype, np.floating):
            arr = np.clip(np.round(arr * 8388608.0), -8388608, 8388607)
        i32 = arr.astype(np.int64).astype(np.uint32).ravel()
        # little-endian 3-byte packing (wavio sampwidth=3 layout)
        b = np.empty((i32.size, 3), dtype=np.uint8)
        b[:, 0] = i32 & 0xFF
        b[:, 1] = (i32 >> 8) & 0xFF
        b[:, 2] = (i32 >> 16) & 0xFF
        data = b.tobytes()
        fmt, bits = _PCM, 24
    else:
        raise ValueError("samplewidth must be 1, 2, 3 or 4")
    block = channels * samplewidth
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, fmt, channels, samplerate,
        samplerate * block, block, bits,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(data: bytes, normalize: bool = False):
    """Parse a RIFF/WAVE stream → (samplerate, samplewidth, wavedata).

    Mirrors the reference contract: raw integer samples by default
    (wavio semantics — the reference bundles wavio.py precisely because
    scipy upshifts 24-bit into full int32 range, while wavio keeps raw
    24-bit values, which the ``/ (2**(8*samplewidth)/2)`` normalize
    rule depends on: uint8 for 8-bit, int16/int32 for 16/24/32-bit with
    24-bit values NOT upshifted, float32 kept as-is); ``normalize=True``
    applies the reference's normalize rule (audiofile_read.py:44-50).
    Mono → 1-D, multi-channel → (n, ch)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_chunk = None
    payload = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt_chunk = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, channels, samplerate, _br, _ba, bits = fmt_chunk
    samplewidth = bits // 8
    if audio_fmt == _FLOAT and bits == 32:
        arr = np.frombuffer(payload, dtype="<f4").astype(np.float64)
    elif audio_fmt == _PCM and bits == 8:
        arr = np.frombuffer(payload, dtype=np.uint8)
    elif audio_fmt == _PCM and bits == 16:
        arr = np.frombuffer(payload, dtype="<i2")
    elif audio_fmt == _PCM and bits == 24:
        # widen 3-byte little-endian to int32 (scipy semantics)
        raw = np.frombuffer(payload, dtype=np.uint8)
        n = len(raw) // 3
        raw = raw[: n * 3].reshape(n, 3)
        arr = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int8).astype(np.int32) << 16)
        )
    elif audio_fmt == _PCM and bits == 32:
        arr = np.frombuffer(payload, dtype="<i4")
    else:
        raise ValueError(f"unsupported WAV format code={audio_fmt} bits={bits}")
    if channels > 1:
        n = len(arr) // channels
        arr = arr[: n * channels].reshape(n, channels)
    if normalize and audio_fmt == _PCM:
        arr = arr / float(2 ** (8 * samplewidth) / 2)
    return samplerate, samplewidth, arr
