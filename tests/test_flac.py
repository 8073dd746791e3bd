"""FLAC codec tests: encoder↔decoder roundtrips plus hand-crafted
bitstreams for the decode surfaces the subset encoder never emits
(LPC subframes, all three stereo decorrelation modes, rice escape
partitions, wasted bits) and corrupt-input hardening."""

import struct

import numpy as np
import pytest

from rp_extract_spark.codecs.flac import (
    FlacError,
    _BitWriter,
    _best_rice,
    _crc8,
    _crc16,
    _utf8_num_bytes,
    _write_rice,
    decode_flac,
    encode_flac,
)


def _sig(n=3000, seed=0, amp=3000, noise=200):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * t / 50)
            + rng.normal(0, noise, n)).astype(np.int64)


# ------------------------------------------------------- roundtrips

def test_roundtrip_mono_16():
    sig = _sig()
    data = encode_flac(sig, 22050, bits=16, blocksize=1024)
    sr, sw, out = decode_flac(data)
    assert (sr, sw) == (22050, 2)
    assert np.array_equal(out, sig)
    assert len(data) < 2 * sig.size  # actually compresses


def test_roundtrip_stereo():
    sig = _sig(5000, seed=1)
    st = np.stack([sig, np.roll(sig, 3)], axis=1)
    sr, sw, out = decode_flac(encode_flac(st, 44100, bits=16))
    assert out.shape == st.shape and np.array_equal(out, st)


def test_roundtrip_8bit_and_constant():
    c = np.full(500, 17, dtype=np.int64)
    sr, sw, out = decode_flac(encode_flac(c, 8000, bits=8, blocksize=256))
    assert (sr, sw) == (8000, 1) and np.array_equal(out, c)


def test_roundtrip_extremes_and_normalize():
    e = np.array([-32768, 32767, 0, -1, 1] * 100, dtype=np.int64)
    assert np.array_equal(decode_flac(encode_flac(e, 11025))[2], e)
    f = np.random.default_rng(2).uniform(-0.5, 0.5, 2000)
    _, _, out = decode_flac(encode_flac(f, 16000), normalize=True)
    assert np.abs(out - np.round(f * 32768) / 32768).max() < 1e-12


def test_encoder_rejects_out_of_contract():
    with pytest.raises(FlacError):
        encode_flac(np.array([1 << 20]), 8000, bits=16)
    with pytest.raises(FlacError):
        encode_flac(np.zeros(10), 8000, bits=24)
    with pytest.raises(FlacError):
        encode_flac(np.zeros(10), 100_000)
    # blocksize outside [16, 65536]: > 2^16 would silently truncate
    # through the 16-bit blocksize-1 header field, < 16 is sub-spec
    with pytest.raises(FlacError):
        encode_flac(np.zeros(10), 8000, blocksize=8)
    with pytest.raises(FlacError):
        encode_flac(np.zeros(10), 8000, blocksize=65537)
    assert decode_flac(encode_flac(np.zeros(10), 8000, blocksize=16))


# ------------------------------------- hand-crafted decoder streams

def _stream(frames: bytes, sr=8000, ch=1, bits=16, total=0) -> bytes:
    si = _BitWriter()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    si.align()
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body + frames


def _frame(write_subframes, bs, sr=8000, ch_code=0, bits=16, fno=0) -> bytes:
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)       # 16-bit blocksize-1
    w.write(13, 4)      # 16-bit samplerate
    w.write(ch_code, 4)
    w.write(4 if bits == 16 else 1, 3)
    w.write(0, 1)
    for b in _utf8_num_bytes(fno):
        w.write(b, 8)
    w.write(bs - 1, 16)
    w.write(sr, 16)
    w.align()
    hdr = w.bytes()
    w2 = _BitWriter()
    w2.write(_crc8(hdr), 8)
    write_subframes(w2)
    w2.align()
    frame = hdr + w2.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def _verbatim(w, sig, bps):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for s in sig:
        w.write(int(s) & ((1 << bps) - 1), bps)


def test_lpc_subframe_decodes():
    """Order-2 LPC with coefs [2,-1] shift 0 == fixed-2 predictor:
    residuals computed independently, reconstruction must give back
    the original signal."""
    sig = _sig(600, seed=3).tolist()
    order, coefs, shift, prec = 2, [2, -1], 0, 4

    def sub(w):
        w.write(0, 1)
        w.write(32 + (order - 1), 6)
        w.write(0, 1)  # no wasted bits
        for s in sig[:order]:
            w.write(s & 0xFFFF, 16)
        w.write(prec - 1, 4)
        w.write(shift & 31, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
        resid = [sig[i] - ((2 * sig[i - 1] - sig[i - 2]) >> shift)
                 for i in range(order, len(sig))]
        param, _ = _best_rice(resid)
        _write_rice(w, resid, param)

    data = _stream(_frame(sub, len(sig)), total=len(sig))
    sr, sw, out = decode_flac(data)
    assert np.array_equal(out, np.asarray(sig))


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(mode):
    rng = np.random.default_rng(4)
    left = rng.integers(-2000, 2000, 400).astype(np.int64)
    right = rng.integers(-2000, 2000, 400).astype(np.int64)
    side = left - right
    if mode == "left_side":
        code, ch0, ch1, bps0, bps1 = 8, left, side, 16, 17
    elif mode == "right_side":
        code, ch0, ch1, bps0, bps1 = 9, side, right, 17, 16
    else:
        mid = (left + right) >> 1
        code, ch0, ch1, bps0, bps1 = 10, mid, side, 16, 17

    def sub(w):
        _verbatim(w, ch0, bps0)
        _verbatim(w, ch1, bps1)

    data = _stream(_frame(sub, 400, ch_code=code), ch=2, total=400)
    _, _, out = decode_flac(data)
    assert np.array_equal(out[:, 0], left)
    assert np.array_equal(out[:, 1], right)


def test_rice_escape_partition():
    """Escape-coded partition: raw 6-bit residuals on a FIXED-0
    subframe decode as the verbatim residual values."""
    vals = [0, 1, -1, 17, -30, 31, -32, 5] * 8

    def sub(w):
        w.write(0, 1)
        w.write(8, 6)   # FIXED order 0
        w.write(0, 1)
        w.write(0, 2)   # rice method 0
        w.write(0, 4)   # partition order 0
        w.write(15, 4)  # escape
        w.write(6, 5)   # 6 raw bits per residual
        for v in vals:
            w.write(v & 0x3F, 6)

    data = _stream(_frame(sub, len(vals)), total=len(vals))
    _, _, out = decode_flac(data)
    assert np.array_equal(out, np.asarray(vals))


def test_wasted_bits_shift():
    sig = (_sig(300, seed=5) & ~0x3).tolist()  # low 2 bits zero

    def sub(w):
        w.write(0, 1)
        w.write(1, 6)   # VERBATIM
        w.write(1, 1)   # wasted flag
        w.write(0b01, 2)  # unary 1 -> wasted = 2 bits
        for s in sig:
            w.write((s >> 2) & 0x3FFF, 14)

    data = _stream(_frame(sub, len(sig)), total=len(sig))
    _, _, out = decode_flac(data)
    assert np.array_equal(out, np.asarray(sig))


def test_crc_mismatch_raises():
    sig = _sig(200, seed=6)
    data = bytearray(encode_flac(sig, 8000))
    data[-1] ^= 0xFF  # corrupt final frame CRC-16
    with pytest.raises(FlacError):
        decode_flac(bytes(data))


def test_fuzz_bitflips_raise_flacerror_only():
    data = encode_flac(_sig(1500, seed=7), 8000, blocksize=512)
    for i in range(0, len(data), 23):
        b = bytearray(data)
        b[i] ^= 0xA5
        try:
            decode_flac(bytes(b))
        except FlacError:
            pass  # loud, typed failure — the contract


def test_fuzz_truncations_raise_flacerror_only():
    data = encode_flac(_sig(800, seed=8), 8000, blocksize=256)
    for cut in range(0, len(data), 11):
        try:
            decode_flac(data[:cut])
        except FlacError:
            pass


def test_decode_audio_dispatches_flac():
    from rp_extract_spark.operators.multimodal import decode_audio

    sig = _sig(1000, seed=9)
    sr, samples = decode_audio(encode_flac(sig, 22050))
    assert sr == 22050
    assert np.abs(samples - sig / 32768.0).max() < 1e-12
