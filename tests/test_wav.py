"""RIFF/WAVE PCM codec + real audio analysis path."""

import numpy as np
import pytest

from rp_extract_spark.codecs.wav import decode_wav, encode_wav

rng = np.random.default_rng(3)


def test_roundtrip_int16_mono():
    x = (rng.random(1000) * 2 - 1) * 0.8
    sr, sw, y = decode_wav(encode_wav(x, 22050))
    assert (sr, sw) == (22050, 2)
    assert y.dtype == np.dtype("<i2") and y.ndim == 1
    assert np.allclose(y / 32768.0, x, atol=1 / 32768)


def test_roundtrip_int16_stereo():
    x = ((rng.random((500, 2)) * 2 - 1) * 0.5)
    sr, sw, y = decode_wav(encode_wav(x, 44100))
    assert y.shape == (500, 2)
    assert np.allclose(y / 32768.0, x, atol=1 / 32768)


def test_roundtrip_float32():
    x = (rng.random(300) * 2 - 1).astype(np.float32)
    sr, sw, y = decode_wav(encode_wav(x, 16000, samplewidth=4))
    assert sw == 4
    assert np.allclose(y, x, atol=1e-7)


def test_roundtrip_uint8():
    x = rng.integers(0, 256, 400).astype(np.uint8)
    sr, sw, y = decode_wav(encode_wav(x, 8000, samplewidth=1))
    assert sw == 1 and y.dtype == np.uint8
    assert np.array_equal(y, x)


def test_normalize_matches_reference_rule():
    # audiofile_read.py:44-50: wavedata / (2**(8*samplewidth)/2)
    x = (rng.random(256) * 2 - 1) * 0.9
    data = encode_wav(x, 44100)
    _, sw, raw = decode_wav(data)
    _, _, norm = decode_wav(data, normalize=True)
    assert np.allclose(norm, raw / (2 ** (8 * sw) / 2))
    assert np.abs(norm).max() <= 1.0


def test_pcm24_widening():
    # hand-build a 24-bit data chunk: values -1, 0, 1, 2^23-1, -2^23
    import struct

    vals = [-1, 0, 1, (1 << 23) - 1, -(1 << 23)]
    payload = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(payload), b"WAVE",
        b"fmt ", 16, 1, 1, 44100, 44100 * 3, 3, 24, b"data", len(payload),
    )
    sr, sw, y = decode_wav(hdr + payload)
    assert sw == 3
    assert list(y) == vals


def test_not_wav_raises():
    with pytest.raises(ValueError):
        decode_wav(b"OggS0000000000000000")


def test_analyze_audio_real_wav(spark):
    from rp_extract_spark.operators.multimodal import analyze_audio

    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(2000) / 8000)
    rows = [
        ("c1", bytearray(encode_wav(tone, 8000))),
        ("c2", bytearray(encode_wav(np.zeros(100), 8000))),
        ("bad", bytearray(b"ID3\x03mp3-payload")),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    got = {r.clip_id: r for r in analyze_audio(df).collect()}
    assert got["c1"].err is None
    assert got["c1"].samplerate == 8000 and got["c1"].n_samples == 2000
    assert abs(got["c1"].rms - 0.5 / np.sqrt(2)) < 1e-3
    assert got["c2"].rms == 0.0
    # an ID3-tagged payload with no valid frames now routes to the
    # in-repo MP3 decoder (round 3) and error-isolates with Mp3Error
    assert got["bad"].err is not None and "Mp3Error" in got["bad"].err


# ---------- MJPEG AVI mux/demux ----------

def test_avi_mjpeg_roundtrip():
    from rp_extract_spark.codecs.avi import demux_avi, encode_mjpeg_avi
    from rp_extract_spark.codecs.jpeg import decode_jpeg

    frames = [
        (np.full((32, 48), 40 * i, dtype=np.uint8) + rng.integers(0, 20, (32, 48)).astype(np.uint8))
        for i in range(5)
    ]
    avi = encode_mjpeg_avi(frames, fps=24, quality=95)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    fps, payloads = demux_avi(avi)
    assert fps == 24.0 and len(payloads) == 5
    for orig, p in zip(frames, payloads):
        dec = decode_jpeg(p)
        assert dec.shape == orig.shape
        from rp_extract_spark.codecs import psnr
        assert psnr(orig, dec) >= 40.0


def test_avi_demux_rejects_non_avi():
    from rp_extract_spark.codecs.avi import demux_avi

    with pytest.raises(ValueError):
        demux_avi(b"RIFF\x00\x00\x00\x00WAVEnotavideo")


def test_sample_video_frames_real_avi(spark):
    from rp_extract_spark.codecs.avi import encode_mjpeg_avi
    from rp_extract_spark.operators.multimodal import sample_video_frames

    frames = [np.full((16, 16), 10 * i, dtype=np.uint8) for i in range(9)]
    rows = [
        ("v1", bytearray(encode_mjpeg_avi(frames, fps=10))),
        ("bad", bytearray(b"\x00\x00\x01\xbaMPEG-PS")),
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    got = sample_video_frames(df, every_n=4).collect()
    v1 = sorted([r for r in got if r.video_id == "v1"], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in v1] == [0, 4, 8]
    from rp_extract_spark.codecs import decode_image

    px = decode_image(bytes(v1[1].frame_bytes), "jpeg")
    assert px.shape == (16, 16)
    bad = [r for r in got if r.video_id == "bad"][0]
    assert bad.err is not None


def test_roundtrip_int24():
    x = (rng.random(600) * 2 - 1) * 0.7
    sr, sw, y = decode_wav(encode_wav(x, 44100, samplewidth=3))
    assert sw == 3
    assert np.allclose(y / 8388608.0, x, atol=1 / 8388608)
    # sign extension of negatives (wavio.py:23-28 trick equivalence)
    neg = np.array([-1.0, -0.5, 0.5], dtype=np.float64) * 0.9
    _, _, z = decode_wav(encode_wav(neg, 8000, samplewidth=3))
    assert (z[:2] < 0).all() and z[2] > 0


def test_roundtrip_int24_stereo():
    x = ((rng.random((200, 2)) * 2 - 1) * 0.6)
    _, _, y = decode_wav(encode_wav(x, 22050, samplewidth=3))
    assert y.shape == (200, 2)
    assert np.allclose(y / 8388608.0, x, atol=1 / 8388608)
