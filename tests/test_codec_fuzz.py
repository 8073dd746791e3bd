"""Codec robustness fuzzing: corrupt/truncated payloads must raise
ValueError (or decode) — never crash, hang, or return garbage shapes.
This is the decode-stage guarantee the per-record quarantine relies on."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rp_extract_spark.codecs.avi import demux_avi, encode_mjpeg_avi
from rp_extract_spark.codecs.jpeg import decode_jpeg, encode_jpeg
from rp_extract_spark.codecs.wav import decode_wav, encode_wav

rng = np.random.default_rng(123)
_IMG = rng.integers(0, 256, (24, 32), dtype=np.uint8)
_JPEG = encode_jpeg(_IMG, 90)
_WAV = encode_wav((rng.random(500) * 2 - 1), 8000)
_AVI = encode_mjpeg_avi([_IMG, _IMG], fps=10)


@settings(max_examples=60, deadline=None)
@given(st.integers(2, len(_JPEG) - 1))
def test_jpeg_truncation_never_crashes(cut):
    try:
        out = decode_jpeg(_JPEG[:cut])
        assert out.shape == _IMG.shape  # only acceptable non-raise outcome
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.integers(2, len(_JPEG) - 1), st.integers(0, 255))
def test_jpeg_bitflip_never_crashes(pos, val):
    data = bytearray(_JPEG)
    data[pos] = val
    try:
        out = decode_jpeg(bytes(data))
        assert out.ndim == 2
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(_WAV) - 1))
def test_wav_truncation_never_crashes(cut):
    try:
        sr, sw, arr = decode_wav(_WAV[:cut])
        assert sr > 0
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(_AVI) - 1))
def test_avi_truncation_never_crashes(cut):
    try:
        fps, frames = demux_avi(_AVI[:cut])
        assert len(frames) >= 1
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_random_bytes_rejected(blob):
    for dec in (decode_jpeg, lambda b: decode_wav(b), lambda b: demux_avi(b)):
        try:
            dec(b"\xff\xd8" + blob if dec is decode_jpeg else blob)
        except ValueError:
            pass
        except Exception as e:  # any other exception type is a bug
            if not isinstance(e, ValueError):
                raise AssertionError(f"{dec}: {type(e).__name__}: {e}") from e


from rp_extract_spark.codecs.bmp import encode_bmp, decode_bmp
from rp_extract_spark.codecs.gif import encode_gif, decode_gif

_BMP = encode_bmp(_IMG)
_GIF = encode_gif(_IMG)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, len(_BMP) - 1))
def test_bmp_truncation_never_crashes(cut):
    try:
        out = decode_bmp(_BMP[:cut])
        assert out.shape == _IMG.shape
    except ValueError:
        pass


@settings(max_examples=50, deadline=None)
@given(st.integers(0, len(_GIF) - 1))
def test_gif_truncation_never_crashes(cut):
    try:
        out = decode_gif(_GIF[:cut])
        assert out.shape[:2] == _IMG.shape
    except ValueError:
        pass


@settings(max_examples=50, deadline=None)
@given(st.integers(6, len(_GIF) - 1), st.integers(0, 255))
def test_gif_bitflip_never_crashes(pos, val):
    data = bytearray(_GIF)
    data[pos] = val
    try:
        decode_gif(bytes(data))
    except ValueError:
        pass
