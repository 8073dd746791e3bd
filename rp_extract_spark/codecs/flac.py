"""Pure-numpy FLAC codec (free lossless audio subset).

Retires one external-decoder stub with a fully verifiable lossless
format (reference analog: the decoder command chain
``audiofile_read.py:171-184``, which shells out to ``flac -d``).
Implemented from the public FLAC format spec (RFC 9639 / xiph.org):

Decoder — the complete subframe surface:
  * STREAMINFO parse (+ skipping all other metadata blocks),
  * frame headers with CRC-8 verification, UTF-8-coded frame numbers,
    all block-size/sample-rate/sample-size codes,
  * CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes,
  * rice + rice2 residual partitions incl. the escape (raw) mode,
  * wasted-bits shift, left/side + right/side + mid/side stereo
    decorrelation (side channel +1 bit),
  * frame CRC-16 verification.

Encoder — a subset writer used for roundtrip fixtures: independent
channels, FIXED predictors 0-2 chosen by residual cost, CONSTANT and
VERBATIM fallbacks, rice partitions of order 0 with exact-cost
parameter search, real streaminfo MD5.

Every read is bounds-checked; corrupt input raises ``FlacError``
(never a segfault-class numpy allocation from attacker-controlled
sizes — block size and channel count are range-checked before use).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacError(ValueError):
    pass


# --------------------------------------------------------------- CRC

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# --------------------------------------------------------------- bits

class _Bits:
    """MSB-first bounds-checked bit reader."""

    __slots__ = ("buf", "pos", "n")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0
        self.n = len(data) * 8

    def read(self, k: int) -> int:
        pos = self.pos
        if pos + k > self.n:
            raise FlacError("truncated stream")
        buf = self.buf
        v = 0
        while k:
            byte_i = pos >> 3
            bit_off = pos & 7
            take = 8 - bit_off
            if take > k:
                take = k
            cur = (buf[byte_i] >> (8 - bit_off - take)) & ((1 << take) - 1)
            v = (v << take) | cur
            pos += take
            k -= take
        self.pos = pos
        return v

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        """Count of 0 bits before the terminating 1."""
        q = 0
        pos = self.pos
        n = self.n
        buf = self.buf
        while True:
            if pos >= n:
                raise FlacError("truncated unary code")
            byte_i = pos >> 3
            bit_off = pos & 7
            chunk = buf[byte_i] & ((1 << (8 - bit_off)) - 1)
            if chunk == 0:
                q += 8 - bit_off
                pos += 8 - bit_off
                continue
            lead = (8 - bit_off) - chunk.bit_length()
            q += lead
            pos += lead + 1
            self.pos = pos
            return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _read_utf8_num(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    mask = 0x40
    while b0 & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise FlacError("invalid UTF-8-coded number")
    v = b0 & (mask - 1)
    for _ in range(n_extra):
        b = bits.read(8)
        if (b & 0xC0) != 0x80:
            raise FlacError("invalid UTF-8 continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    p = bits.read(4)
    if blocksize % (1 << p):
        raise FlacError("block size not divisible by partition count")
    out: list[int] = []
    for part in range(1 << p):
        count = (blocksize >> p) - (order if part == 0 else 0)
        if count < 0:
            raise FlacError("predictor order exceeds partition size")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend([0] * count)
            else:
                out.extend(bits.read_signed(raw) for _ in range(count))
        else:
            for _ in range(count):
                q = bits.unary()
                u = (q << param) | bits.read(param) if param else q
                out.append((u >> 1) ^ -(u & 1))
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise FlacError("subframe padding bit set")
    sftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")
    if sftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        samples = [v] * blocksize
    elif sftype == 1:  # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= sftype <= 12:  # FIXED
        order = sftype - 8
        if order > blocksize:
            raise FlacError("predictor order exceeds block size")
        samples = [bits.read_signed(eff) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for e in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + pred)
    elif sftype >= 32:  # LPC
        order = (sftype & 31) + 1
        if order > blocksize:
            raise FlacError("predictor order exceeds block size")
        samples = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise FlacError("invalid qlp precision")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise FlacError("negative qlp shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        for e in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(e + pred)
    else:
        raise FlacError(f"reserved subframe type {sftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(data: bytes, normalize: bool = False):
    """Parse a FLAC stream → (samplerate, samplewidth, samples).

    Same contract as ``decode_wav``: raw integer samples (int32), mono
    1-D / multi-channel (n, ch); ``normalize=True`` applies the
    reference rule ``/ (2**(8*samplewidth)/2)``. ``samplewidth`` is
    ``ceil(bits/8)``."""
    if len(data) < 42 or data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata block header")
        hdr = data[pos]
        blen = int.from_bytes(data[pos + 1: pos + 4], "big")
        body = data[pos + 4: pos + 4 + blen]
        if len(body) != blen:
            raise FlacError("truncated metadata block")
        if hdr & 0x7F == 0:
            if blen != 34:
                raise FlacError("bad STREAMINFO length")
            streaminfo = body
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise FlacError("missing STREAMINFO")
    si = _Bits(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    sr_si = si.read(20)
    ch_si = si.read(3) + 1
    bps_si = si.read(5) + 1
    total = si.read(36)
    if sr_si == 0:
        raise FlacError("invalid stream sample rate")

    bits = _Bits(data)
    bits.pos = pos * 8
    chans: list[list[int]] = [[] for _ in range(ch_si)]
    got = 0
    while bits.pos + 16 <= bits.n and (total == 0 or got < total):
        frame_start = bits.pos >> 3
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise FlacError("bad frame sync code")
        if bits.read(1):
            raise FlacError("reserved frame header bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise FlacError("reserved frame header bit set")
        _read_utf8_num(bits)
        if bs_code == 0:
            raise FlacError("reserved block size code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZES[bs_code]
        if sr_code == 0:
            samplerate = sr_si
        elif sr_code == 12:
            samplerate = bits.read(8) * 1000
        elif sr_code == 13:
            samplerate = bits.read(16)
        elif sr_code == 14:
            samplerate = bits.read(16) * 10
        elif sr_code == 15:
            raise FlacError("invalid sample rate code")
        else:
            samplerate = _RATES[sr_code]
        if ss_code == 0:
            bps = bps_si
        elif ss_code in _SAMPLE_SIZES:
            bps = _SAMPLE_SIZES[ss_code]
        else:
            raise FlacError("reserved sample size code")
        crc_pos = bits.pos >> 3
        if _crc8(data[frame_start:crc_pos]) != bits.read(8):
            raise FlacError("frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_ch = ch_code + 1
            if n_ch != ch_si:
                raise FlacError("frame channel count differs from STREAMINFO")
            sub = [_decode_subframe(bits, blocksize, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if ch_si != 2:
                raise FlacError("stereo decorrelation in non-stereo stream")
            side_idx = 1 if ch_code in (8, 10) else 0
            sub = [
                _decode_subframe(bits, blocksize, bps + (1 if i == side_idx else 0))
                for i in range(2)
            ]
            if ch_code == 8:  # left/side
                left, side = sub
                sub = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side (side first)
                side, right = sub
                sub = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid, side = sub
                lr = [((m << 1) | (s & 1), s) for m, s in zip(mid, side)]
                sub = [[(m + s) >> 1 for m, s in lr],
                       [(m - s) >> 1 for m, s in lr]]
        else:
            raise FlacError("reserved channel assignment")
        bits.align()
        crc_pos = bits.pos >> 3
        if _crc16(data[frame_start:crc_pos]) != bits.read(16):
            raise FlacError("frame CRC-16 mismatch")
        for c in range(ch_si):
            chans[c].extend(sub[c])
        got += blocksize

    if total and got < total:
        raise FlacError("stream ends before STREAMINFO total_samples")
    if total:
        chans = [c[:total] for c in chans]
    arr = np.asarray(chans, dtype=np.int64).T
    samplewidth = (bps_si + 7) // 8
    lim = 1 << (bps_si - 1)
    if arr.size and (arr.max(initial=0) >= lim or arr.min(initial=0) < -lim):
        raise FlacError("decoded sample exceeds declared bit depth")
    out = arr.astype(np.int32)
    if ch_si == 1:
        out = out[:, 0]
    if normalize:
        # left-align odd bit depths (12/20-bit) to the container byte
        # width first — the reference's flac-d-to-WAV chain writes
        # left-aligned samples, so dividing the raw values by the
        # byte-width scale would normalize to a fraction of full scale
        shift = 8 * samplewidth - bps_si
        if shift:
            out = out << shift
        out = out / float(2 ** (8 * samplewidth) / 2)
    return sr_si, samplewidth, out


# ------------------------------------------------------------ encoder

class _BitWriter:
    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, value: int, k: int) -> None:
        if k == 0:
            return
        self.acc = (self.acc << k) | (value & ((1 << k) - 1))
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _utf8_num_bytes(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    parts = []
    n = 1
    while True:
        parts.append(0x80 | (v & 0x3F))
        v >>= 6
        n += 1
        if v < (1 << (7 - n)) and n <= 7:
            lead = (0xFF << (8 - n)) & 0xFF | v
            return bytes([lead] + parts[::-1])
        if n > 6:
            raise FlacError("frame number too large")


def _rice_cost(resid: list[int], param: int) -> int:
    return sum((((e << 1) ^ (e >> 63)) >> param) + 1 + param
               for e in np.asarray(resid, dtype=np.int64).tolist())


def _best_rice(resid: list[int]) -> tuple[int, int]:
    best_p, best_c = 0, _rice_cost(resid, 0)
    for p in range(1, 15):
        c = _rice_cost(resid, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _write_rice(w: _BitWriter, resid: list[int], param: int) -> None:
    w.write(0, 2)   # rice 4-bit method
    w.write(0, 4)   # partition order 0
    w.write(param, 4)
    for e in resid:
        # zigzag: positive e -> 2e, negative e -> -2e-1
        u = (e << 1) if e >= 0 else (((-e) << 1) - 1)
        q = u >> param
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        if param:
            w.write(u & ((1 << param) - 1), param)


def encode_flac(samples: np.ndarray, samplerate: int, bits: int = 16,
                blocksize: int = 4096) -> bytes:
    """Subset FLAC encoder for fixtures: integer (or [-1,1) float)
    samples, mono 1-D or (n, ch); independent channels; per-subframe
    best of CONSTANT / FIXED(0-2)+rice / VERBATIM."""
    arr = np.asarray(samples)
    if np.issubdtype(arr.dtype, np.floating):
        lim = 1 << (bits - 1)
        arr = np.clip(np.round(arr * lim), -lim, lim - 1)
    arr = arr.astype(np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if not 16 <= blocksize <= 65536:
        # > 65536 would silently truncate through the 16-bit
        # blocksize-1 header field; < 16 violates the FLAC minimum
        raise FlacError("blocksize must be in [16, 65536]")
    if not 1 <= ch <= 8:
        raise FlacError("1-8 channels supported")
    if bits not in (8, 16):
        raise FlacError("encoder subset writes 8- or 16-bit streams")
    if not 0 < samplerate < 65536:
        raise FlacError("encoder subset needs samplerate in (0, 65536)")
    lim = 1 << (bits - 1)
    if n and (arr.max() >= lim or arr.min() < -lim):
        raise FlacError(f"samples exceed {bits}-bit range")

    sampwidth = bits // 8
    md5 = hashlib.md5()
    little = arr.astype("<i8" if bits > 32 else f"<i{sampwidth}")
    md5.update(little.tobytes())

    frames = bytearray()
    for fno, start in enumerate(range(0, max(n, 1), blocksize)):
        blk = arr[start:start + blocksize]
        bs = len(blk)
        if bs == 0:
            break
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)          # fixed blocking
        w.write(7, 4)          # 16-bit blocksize-1 follows
        w.write(13, 4)         # 16-bit samplerate in Hz follows
        w.write(ch - 1, 4)     # independent channels
        w.write(1 if bits == 8 else 4, 3)
        w.write(0, 1)
        for b in _utf8_num_bytes(fno):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.write(samplerate, 16)
        w.align()
        hdr = w.bytes()
        w2 = _BitWriter()
        w2.write(_crc8(hdr), 8)
        for c in range(ch):
            sig = blk[:, c].tolist()
            _write_subframe(w2, sig, bs, bits)
        w2.align()
        body = w2.bytes()
        frame = hdr + body
        frames += frame + struct.pack(">H", _crc16(frame))

    si = _BitWriter()
    si.write(min(blocksize, max(n, 16)), 16)   # min blocksize
    si.write(min(blocksize, max(n, 16)), 16)   # max blocksize
    si.write(0, 24)
    si.write(0, 24)
    si.write(samplerate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + md5.digest()
    meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return b"fLaC" + meta + bytes(frames)


def _write_subframe(w: _BitWriter, sig: list[int], bs: int, bits: int) -> None:
    if all(s == sig[0] for s in sig):
        w.write(0, 1)
        w.write(0, 6)   # CONSTANT
        w.write(0, 1)
        w.write(sig[0] & ((1 << bits) - 1), bits)
        return
    best = None  # (cost, order, resid, param)
    for order, coefs in ((0, []), (1, [1]), (2, [2, -1])):
        if order >= bs:
            continue
        resid = [
            sig[i] - sum(c * sig[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, bs)
        ]
        param, cost = _best_rice(resid)
        cost += order * bits
        if best is None or cost < best[0]:
            best = (cost, order, resid, param)
    verbatim_cost = bs * bits
    if best is None or best[0] >= verbatim_cost:
        w.write(0, 1)
        w.write(1, 6)   # VERBATIM
        w.write(0, 1)
        for s in sig:
            w.write(s & ((1 << bits) - 1), bits)
        return
    _, order, resid, param = best
    w.write(0, 1)
    w.write(8 + order, 6)   # FIXED
    w.write(0, 1)
    for s in sig[:order]:
        w.write(s & ((1 << bits) - 1), bits)
    _write_rice(w, resid, param)
