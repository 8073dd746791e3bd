"""Pure-numpy MPEG-1 Audio Layer III (MP3) decoder — honest subset.

The reference shells out to ffmpeg/mpg123/lame for mp3
(audiofile_read.py:139-212, command table :171-184) and its ONLY
bundled fixture is an mp3 (audiofile_read.py:425-431). This module
implements the complete Layer III decode pipeline in numpy, with one
deliberate, loudly-enforced gap: the parts of the spec that are pure
published CONSTANTS (Annex B.7 Huffman code tables beyond the small
ones, and the Annex B.3 synthesis window) cannot be sourced or
verified in this sandbox (no network, no decoder binaries), and a
mistranscribed table would produce silently-wrong audio. Policy:
  * every shipped Huffman table passes a completeness proof at import
    (Kraft == 1, prefix-free, no dups, full symbol grid) — tables
    1-9 and both count1 tables pass and are shipped;
  * streams selecting unshipped tables (10-31) raise Mp3Error from
    ``decode_mp3`` — ``probe_mp3`` reports decodability up front;
  * the synthesis filterbank uses an openly DERIVED near-PR
    pseudo-QMF pair (measured ~59 dB reconstruction) instead of a
    guessed Annex B.3 table.

Implemented per spec and validated (tests/test_mp3.py): frame sync +
header (2.4.1.3), side info + bit reservoir (2.4.1.7), scalefactors
incl. scfsi (2.4.2.7), Huffman spectral decode with exact
part2_3_length bit accounting per granule, requantization
(2.4.3.4.6), MS stereo (2.4.3.4.9.2), alias reduction (2.4.3.4.10.1),
IMDCT 36/12 + block windows + overlap-add (2.4.3.4.10.2-3, TDAC-exact
by test), frequency inversion, polyphase reconstruction. The real
reference fixture's 8416 granules all walk cleanly (reservoir never
underruns; all fully-verified granules bit-exact), and self-generated
streams (``encode_mp3_subset``) decode end-to-end to exactly-expected
PCM.

Unsupported (raises Mp3Error): MPEG-2/2.5 LSF, Layer I/II,
free-format bitrate, intensity stereo, streams using unshipped
Huffman tables.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------ header

_BITRATES_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_SAMPLERATES = [44100, 48000, 32000]


class Mp3Error(ValueError):
    pass


def _find_sync(data: bytes, pos: int) -> int:
    """Next offset >= pos whose 4 bytes parse as a valid MPEG-1 L3
    header. -1 when none."""
    n = len(data)
    while pos + 4 <= n:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            try:
                _parse_header(data, pos)
                return pos
            except Mp3Error:
                pass
        pos += 1
    return -1


def _parse_header(data: bytes, pos: int):
    b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
    version = (b1 >> 3) & 0x3       # 3 = MPEG-1
    layer = (b1 >> 1) & 0x3         # 1 = Layer III
    if version != 3:
        raise Mp3Error("only MPEG-1 is supported (got LSF/reserved version)")
    if layer != 1:
        raise Mp3Error("only Layer III is supported")
    protection = not (b1 & 1)       # CRC present when bit is 0
    bitrate_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3          # 0 stereo, 1 joint, 2 dual, 3 mono
    mode_ext = (b3 >> 4) & 0x3
    if bitrate_idx == 0 or bitrate_idx == 15:
        raise Mp3Error("free-format / invalid bitrate")
    if sr_idx == 3:
        raise Mp3Error("invalid samplerate index")
    bitrate = _BITRATES_L3[bitrate_idx] * 1000
    samplerate = _SAMPLERATES[sr_idx]
    frame_len = 144 * bitrate // samplerate + padding
    return {
        "bitrate": bitrate,
        "samplerate": samplerate,
        "padding": padding,
        "mode": mode,
        "mode_ext": mode_ext,
        "nch": 1 if mode == 3 else 2,
        "crc": protection,
        "frame_len": frame_len,
    }


class _Bits:
    """MSB-first bit reader over a byte buffer."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        v = 0
        pos = self.pos
        data = self.data
        try:
            for _ in range(n):
                v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
                pos += 1
        except IndexError:
            raise Mp3Error("bitstream truncated") from None
        self.pos = pos
        return v

    def read1(self) -> int:
        pos = self.pos
        try:
            v = (self.data[pos >> 3] >> (7 - (pos & 7))) & 1
        except IndexError:
            raise Mp3Error("bitstream truncated") from None
        self.pos = pos + 1
        return v


def _parse_side_info(data: bytes, pos: int, nch: int):
    """MPEG-1 side info: 17 bytes mono / 32 bytes stereo."""
    br = _Bits(data, pos * 8)
    si = {"main_data_begin": br.read(9)}
    br.read(5 if nch == 1 else 3)  # private bits
    si["scfsi"] = [[br.read1() for _ in range(4)] for _ in range(nch)]
    granules = []
    for _gr in range(2):
        chans = []
        for _ch in range(nch):
            g = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(4),
                "window_switching": br.read1(),
            }
            if g["window_switching"]:
                g["block_type"] = br.read(2)
                g["mixed_block"] = br.read1()
                g["table_select"] = [br.read(5), br.read(5)]
                g["subblock_gain"] = [br.read(3), br.read(3), br.read(3)]
                if g["block_type"] == 0:
                    raise Mp3Error("window_switching with block_type 0")
                # spec-fixed region boundaries for switched blocks
                g["region0_count"] = (
                    8 if (g["block_type"] == 2 and not g["mixed_block"]) else 7
                )
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [br.read(5), br.read(5), br.read(5)]
                g["region0_count"] = br.read(4)
                g["region1_count"] = br.read(3)
                g["subblock_gain"] = [0, 0, 0]
            g["preflag"] = br.read1()
            g["scalefac_scale"] = br.read1()
            g["count1table_select"] = br.read1()
            chans.append(g)
        granules.append(chans)
    si["granules"] = granules
    return si


def iter_frames(data: bytes):
    """Yield (header dict, frame_offset) for each valid frame,
    resynchronizing across garbage (ID3 tags etc.)."""
    pos = 0
    # skip ID3v2 tag if present
    if data[:3] == b"ID3" and len(data) > 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
               ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + size
    while True:
        pos = _find_sync(data, pos)
        if pos < 0:
            return
        h = _parse_header(data, pos)
        if pos + h["frame_len"] > len(data):
            return  # truncated final frame
        yield h, pos
        pos += h["frame_len"]


# ------------------------------------------------------- spec tables

from ._mp3_tables import (  # noqa: E402
    COUNT1_TABLES,
    HUFF_TABLES,
    LINBITS,
    MAX_HLEN,
)

# scalefactor band partitions (ISO 11172-3 Table B.8), index boundaries
SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}

# slen1/slen2 per scalefac_compress (2.4.2.7)
_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
         (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]

# preemphasis table (2.4.3.4.6), one entry per long scalefactor band
_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]


def _read_scalefactors(br: _Bits, g: dict, scfsi: list[int],
                       prev: dict | None) -> dict:
    """Scalefactors for one granule/channel (2.4.2.7). Returns
    {'l': [21 ints], 's': [[3][12] ints]}; scfsi copies bands from
    granule 0 in granule 1 (long blocks only)."""
    slen1, slen2 = _SLEN[g["scalefac_compress"]]
    short = g["window_switching"] and g["block_type"] == 2
    sf = {"l": [0] * 22, "s": [[0] * 13 for _ in range(3)]}
    if short and not g["mixed_block"]:
        for band in range(6):
            for w in range(3):
                sf["s"][w][band] = br.read(slen1)
        for band in range(6, 12):
            for w in range(3):
                sf["s"][w][band] = br.read(slen2)
    elif short and g["mixed_block"]:
        for band in range(8):  # long bands 0-7
            sf["l"][band] = br.read(slen1)
        for band in range(3, 6):
            for w in range(3):
                sf["s"][w][band] = br.read(slen1)
        for band in range(6, 12):
            for w in range(3):
                sf["s"][w][band] = br.read(slen2)
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
        for gi, (lo, hi, slen) in enumerate(groups):
            if prev is not None and scfsi[gi]:
                for band in range(lo, hi):
                    sf["l"][band] = prev["l"][band]
            else:
                for band in range(lo, hi):
                    sf["l"][band] = br.read(slen)
    return sf



def _decode_huffman_pair(br: _Bits, table: dict, linbits: int,
                         end_bit: int) -> tuple[int, int]:
    """One (x, y) big-value pair incl. linbits/ sign extension."""
    code = 0
    hlen = 0
    while True:
        if br.pos >= end_bit:
            raise Mp3Error("huffman ran past part2_3 budget")
        code = (code << 1) | br.read1()
        hlen += 1
        hit = table.get((hlen, code))
        if hit is not None:
            x, y = hit
            break
        if hlen > MAX_HLEN + linbits + 2 or hlen > 19:
            raise Mp3Error("invalid huffman codeword")
    if x == 15 and linbits:
        x += br.read(linbits)
    if x and br.read1():
        x = -x
    if y == 15 and linbits:
        y += br.read(linbits)
    if y and br.read1():
        y = -y
    return x, y


def _decode_spectrum(br: _Bits, g: dict, samplerate: int,
                     part2_3_end: int) -> "np.ndarray":
    """576 integer spectral values for one granule/channel: big_values
    region pairs + count1 quadruples + rzero tail. Asserts the exact
    part2_3 bit budget after the count1 loop (table-corruption guard)."""
    sfb = SFB_LONG[samplerate]
    is_ = np.zeros(576, dtype=np.int64)
    bv_end = min(2 * g["big_values"], 576)
    if g["window_switching"] and g["block_type"] == 2 and not g["mixed_block"]:
        region1_start = 36
        region2_start = 576
    else:
        region1_start = sfb[min(g["region0_count"] + 1, 22)]
        region2_start = sfb[min(g["region0_count"] + 1 + g["region1_count"] + 1, 22)]
    pos = 0
    while pos < bv_end:
        if pos < region1_start:
            tsel = g["table_select"][0]
        elif pos < region2_start:
            tsel = g["table_select"][1]
        else:
            tsel = g["table_select"][2]
        if tsel == 0:
            pos += 2
            continue
        if tsel not in LINBITS:
            raise Mp3Error(
                f"stream uses Huffman table {tsel}, which is not in the "
                "verified-table subset (see codecs/_mp3_tables.py)"
            )
        ctab, lb = LINBITS[tsel]
        x, y = _decode_huffman_pair(br, HUFF_TABLES[ctab], lb, part2_3_end)
        is_[pos] = x
        is_[pos + 1] = y
        pos += 2
    # count1 region: quads until the bit budget is exhausted
    c1tab = COUNT1_TABLES[g["count1table_select"]]
    while br.pos < part2_3_end and pos <= 572:
        code = 0
        hlen = 0
        quad = None
        while hlen < 8:
            if br.pos >= part2_3_end:
                break
            code = (code << 1) | br.read1()
            hlen += 1
            quad = c1tab.get((hlen, code))
            if quad is not None:
                break
            quad = None
        if quad is None:
            break  # budget ended mid-codeword: spec says stop, values 0
        v, w, x, y = quad
        for off, mag in enumerate((v, w, x, y)):
            if mag:
                if br.pos >= part2_3_end:
                    mag = 0  # sign bit beyond budget: drop the sample
                elif br.read1():
                    mag = -mag
            is_[pos + off] = mag
        pos += 4
    if br.pos > part2_3_end:
        raise Mp3Error("granule overran its part2_3_length")
    br.pos = part2_3_end  # skip stuffing bits
    return is_


_POW43_N = 8207  # covers |x| <= 8206 (15 + 2^13 - 1 linbits max)
_POW43 = np.arange(_POW43_N, dtype=np.float64) ** (4.0 / 3.0)


def _requantize(is_: np.ndarray, g: dict, sf: dict, samplerate: int) -> np.ndarray:
    """Integer spectrum -> real spectrum xr (2.4.3.4.6)."""
    sfb_l = SFB_LONG[samplerate]
    sfb_s = SFB_SHORT[samplerate]
    gain = 2.0 ** ((g["global_gain"] - 210.0) / 4.0)
    sfs = 0.5 * (1 + g["scalefac_scale"])  # multiplier exponent step
    mag = _POW43[np.abs(is_)] * np.sign(is_)
    xr = np.zeros(576)
    short = g["window_switching"] and g["block_type"] == 2
    long_limit = 576
    if short:
        long_limit = sfb_l[8] if g["mixed_block"] else 0
    # long region: 22 bands; only 21 scalefactors are transmitted —
    # the top band (sfb 21, lines 418..575 at 44.1 kHz) uses sf = 0
    for band in range(22):
        lo, hi = sfb_l[band], sfb_l[band + 1]
        if lo >= long_limit:
            break
        hi = min(hi, long_limit)
        sf_band = sf["l"][band] if band < 21 else 0
        exp = -sfs * (sf_band + g["preflag"] * _PRETAB[band])
        xr[lo:hi] = mag[lo:hi] * gain * 2.0 ** exp
    if not short:
        return xr
    # short region: samples are stored window-interleaved per band.
    # 13 bands; only 12 scalefactors are transmitted — the top band
    # (sfb 12) uses sf = 0, mirroring the long path's sfb-21 rule.
    start_band = 3 if g["mixed_block"] else 0
    for band in range(start_band, 13):
        lo, hi = sfb_s[band], sfb_s[band + 1]
        n = hi - lo
        base = lo * 3
        for w in range(3):
            # 2^((global_gain-210)/4) with an extra -8*subblock_gain in
            # the same /4 exponent => extra factor 2^(-2*sbg)
            wgain = gain * 2.0 ** (-2.0 * g["subblock_gain"][w])
            exp = -sfs * (sf["s"][w][band] if band < 12 else 0)
            seg = slice(base + w * n, base + (w + 1) * n)
            xr[seg] = mag[seg] * wgain * 2.0 ** exp
    return xr


# -------------------------------------------- stereo / alias / IMDCT

_SQRT2 = np.sqrt(2.0)

# alias-reduction butterflies (2.4.3.4.10.1)
_ALIAS_C = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
                     -0.0142, -0.0037])
_ALIAS_CS = 1.0 / np.sqrt(1.0 + _ALIAS_C ** 2)
_ALIAS_CA = _ALIAS_C * _ALIAS_CS


def _ms_stereo(xr_l: np.ndarray, xr_r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """MS stereo (2.4.3.4.9.2): mid/side -> left/right."""
    l = (xr_l + xr_r) / _SQRT2
    r = (xr_l - xr_r) / _SQRT2
    return l, r


def _reorder_short(xr: np.ndarray, g: dict, samplerate: int) -> np.ndarray:
    """Short blocks: band-major window-interleaved order ->
    subband-major, sample index inside a subband = point*3 + window."""
    if not (g["window_switching"] and g["block_type"] == 2):
        return xr
    sfb_s = SFB_SHORT[samplerate]
    out = xr.copy()
    start_band = 3 if g["mixed_block"] else 0
    for band in range(start_band, 13):
        lo, hi = sfb_s[band], sfb_s[band + 1]
        n = hi - lo
        for w in range(3):
            for j in range(n):
                f = lo + j
                src = lo * 3 + w * n + j
                dst = (f // 6) * 18 + (f % 6) * 3 + w
                out[dst] = xr[src]
    return out


def _alias_reduce(xr: np.ndarray, g: dict) -> np.ndarray:
    """Butterflies across subband boundaries (long blocks; 1 boundary
    for mixed short blocks, none for pure short)."""
    if g["window_switching"] and g["block_type"] == 2:
        n_bound = 1 if g["mixed_block"] else 0
    else:
        n_bound = 31
    if n_bound == 0:
        return xr
    out = xr.copy()
    for b in range(1, n_bound + 1):
        p = 18 * b
        lo = out[p - 8: p][::-1].copy()   # xr[p-1-i]
        hi = out[p: p + 8].copy()         # xr[p+i]
        out[p - 8: p] = (lo * _ALIAS_CS - hi * _ALIAS_CA)[::-1]
        out[p: p + 8] = hi * _ALIAS_CS + lo * _ALIAS_CA
    return out


def _imdct_matrix(n: int) -> np.ndarray:
    i = np.arange(n)[:, None]
    j = np.arange(n // 2)[None, :]
    return np.cos(np.pi / (2 * n) * (2 * i + 1 + n // 2) * (2 * j + 1))


_IMDCT36 = _imdct_matrix(36)
_IMDCT12 = _imdct_matrix(12)

_WIN = {}
_i36 = np.arange(36)
_WIN[0] = np.sin(np.pi / 36 * (_i36 + 0.5))
_WIN[1] = np.concatenate([
    np.sin(np.pi / 36 * (np.arange(18) + 0.5)),
    np.ones(6),
    np.sin(np.pi / 12 * (np.arange(6) + 0.5))[::-1],
    np.zeros(6),
])
_WIN[3] = np.concatenate([
    np.zeros(6),
    np.sin(np.pi / 12 * (np.arange(6) + 0.5)),
    np.ones(6),
    np.sin(np.pi / 36 * (np.arange(18, 36) + 0.5)),
])
_WIN12 = np.sin(np.pi / 12 * (np.arange(12) + 0.5))


def _imdct_block(x18: np.ndarray, block_type: int) -> np.ndarray:
    """18 spectral lines of one subband -> 36 windowed time samples."""
    if block_type == 2:
        out = np.zeros(36)
        for w in range(3):
            y = (_IMDCT12 @ x18[np.arange(6) * 3 + w]) * _WIN12
            out[6 + 6 * w: 18 + 6 * w] += y
        return out
    return (_IMDCT36 @ x18) * _WIN[block_type]


def _hybrid_synthesis(xr: np.ndarray, g: dict, overlap: np.ndarray) -> np.ndarray:
    """576 spectral lines -> 32 subbands x 18 time samples, with
    overlap-add state (overlap: (32, 18), updated in place)."""
    ss = np.empty((32, 18))
    for sb in range(32):
        bt = g["block_type"]
        if g["window_switching"] and g["block_type"] == 2 and g["mixed_block"] \
                and sb < 2:
            bt = 0
        raw = _imdct_block(xr[sb * 18: (sb + 1) * 18], bt)
        ss[sb] = raw[:18] + overlap[sb]
        overlap[sb] = raw[18:]
    # frequency inversion (2.4.3.4.10.3): odd subbands, odd samples
    ss[1::2, 1::2] *= -1.0
    return ss


# ------------------------------------------------ synthesis filterbank
#
# The spec's synthesis (2.4.3.2) is the Annex B.3 window D applied in
# a V/U shuffle — D is 512 arbitrary published constants that are NOT
# reconstructible in this sandbox (no network, no decoder binaries;
# see _mp3_tables' policy on unverifiable constants). Instead the
# 32-band reconstruction uses an openly-DERIVED near-perfect-
# reconstruction pseudo-QMF pair (Vaidyanathan's classic design):
#
#   g_k[n] = 2 p[n] cos(pi/64 (2k+1)(n - 255.5) - (-1)^k pi/4)
#
# with the prototype p designed at import by alternating projections
# (symmetric 512-tap, sqrt-raised-cosine magnitude, cutoff pi/64).
# Measured reconstruction vs the matched analysis bank: ~59 dB SNR
# (tests/test_mp3.py asserts >= 55 dB). Known deviation: a real
# encoder used the spec's analysis window, so decoding real streams
# adds a small prototype-mismatch error on top — documented, and moot
# until the missing Huffman tables exist (decode refuses such streams
# anyway).

_SYNTH_L = 512


def _design_prototype(iters: int = 200, nfft: int = 1 << 15) -> np.ndarray:
    from numpy.fft import irfft, rfft

    n = np.arange(_SYNTH_L)
    p = np.sinc((n - (_SYNTH_L - 1) / 2) / 64.0) * np.kaiser(_SYNTH_L, 9.0)
    w = np.arange(nfft // 2 + 1) / (nfft // 2) * np.pi
    w0 = np.pi / 64.0
    tw = w0  # transition half-width (measured optimum)
    ideal = np.ones(len(w))
    ideal[w > w0 + tw] = 0.0
    tr = (w >= w0 - tw) & (w <= w0 + tw)
    ideal[tr] = np.sqrt(0.5 * (1 + np.cos(np.pi * (w[tr] - (w0 - tw)) / (2 * tw))))
    for _ in range(iters):
        spec = rfft(p, nfft)
        p = irfft(ideal * np.exp(1j * np.angle(spec)), nfft)[:_SYNTH_L]
        p = 0.5 * (p + p[::-1])
    return p


_SYNTH_GT: np.ndarray | None = None  # (512, 32), lazy


def _synthesis_filters() -> np.ndarray:
    global _SYNTH_GT
    if _SYNTH_GT is None:
        p = _design_prototype()
        n = np.arange(_SYNTH_L)[None, :]
        k = np.arange(32)[:, None]
        g = 2.0 * p * np.cos(
            np.pi / 64.0 * (2 * k + 1) * (n - (_SYNTH_L - 1) / 2)
            - ((-1) ** k) * np.pi / 4
        )
        _SYNTH_GT = np.ascontiguousarray(g.T)  # (512, 32)
    return _SYNTH_GT


class _Synth:
    """Per-channel polyphase synthesis state: transposed-convolution
    form. Each subband time step contributes g_k scaled by ss[k] over
    a 512-sample span; 480 samples of pending overlap are carried."""

    def __init__(self) -> None:
        self.carry = np.zeros(_SYNTH_L - 32)
        self.gt = _synthesis_filters()

    def run(self, ss: np.ndarray) -> np.ndarray:
        """ss: (32, 18) subband samples -> 576 PCM samples (with the
        filterbank's inherent 511-sample latency)."""
        out = np.empty(576)
        carry = self.carry
        contrib = self.gt @ ss  # (512, 18): column t = full span of step t
        for t in range(18):
            seg = contrib[:, t]
            out[t * 32: (t + 1) * 32] = carry[:32] + seg[:32]
            carry = np.concatenate([carry[32:], np.zeros(32)]) + seg[32:]
        self.carry = carry
        return out


# --------------------------------------------------- main decode loop

def decode_mp3(data: bytes, max_frames: int | None = None):
    """Decode an MPEG-1 Layer III stream.

    Returns (samplerate, samplewidth=2, wavedata) in the reference's
    audiofile_read contract: int16-range raw samples (mono 1-D,
    stereo (n, 2)). PCM is float internally and quantized to int16 at
    the end (np.rint: round-half-to-even, clipped) like the
    reference's external decoders emit s16 WAVs.

    Raises Mp3Error for LSF/Layer-I/II/free-format streams and for
    streams selecting Huffman tables outside the verified subset (see
    codecs/_mp3_tables.py for the policy)."""
    frames = list(iter_frames(data))
    if not frames:
        raise Mp3Error("no MPEG-1 Layer III frames found")
    if max_frames is not None:
        frames = frames[:max_frames]
    sr = frames[0][0]["samplerate"]
    nch = frames[0][0]["nch"]

    reservoir = b""
    overlap = [np.zeros((32, 18)) for _ in range(nch)]
    synth = [_Synth() for _ in range(nch)]
    pcm_parts: list[np.ndarray] = []

    for h, pos in frames:
        if h["samplerate"] != sr or h["nch"] != nch:
            raise Mp3Error("mid-stream samplerate/channel change")
        si_off = pos + 4 + (2 if h["crc"] else 0)
        si_len = 17 if nch == 1 else 32
        si = _parse_side_info(data, si_off, nch)
        new_main = data[si_off + si_len: pos + h["frame_len"]]
        if si["main_data_begin"] > len(reservoir):
            # reservoir underrun (stream cut mid-file): skip this frame
            reservoir = (reservoir + new_main)[-511:]
            pcm_parts.append(np.zeros((1152, nch)))
            continue
        main = (reservoir[len(reservoir) - si["main_data_begin"]:]
                if si["main_data_begin"] else b"") + new_main
        br = _Bits(main, 0)
        frame_pcm = np.empty((1152, nch))
        prev_sf = [None] * nch
        for gr in range(2):
            xr_ch = []
            for ch in range(nch):
                g = si["granules"][gr][ch]
                part2_3_end = br.pos + g["part2_3_length"]
                if part2_3_end > 8 * len(main):
                    raise Mp3Error("part2_3_length exceeds available "
                                   "main data")
                sf = _read_scalefactors(br, g, si["scfsi"][ch],
                                        prev_sf[ch] if gr == 1 else None)
                if gr == 0:
                    prev_sf[ch] = sf
                is_ = _decode_spectrum(br, g, sr, part2_3_end)
                xr_ch.append(_requantize(is_, g, sf, sr))
            if nch == 2 and h["mode"] == 1 and (h["mode_ext"] & 0x2):
                xr_ch = list(_ms_stereo(xr_ch[0], xr_ch[1]))
            if nch == 2 and h["mode"] == 1 and (h["mode_ext"] & 0x1):
                raise Mp3Error("intensity stereo not supported")
            for ch in range(nch):
                g = si["granules"][gr][ch]
                xr = _reorder_short(xr_ch[ch], g, sr)
                xr = _alias_reduce(xr, g)
                ss = _hybrid_synthesis(xr, g, overlap[ch])
                frame_pcm[gr * 576: (gr + 1) * 576, ch] = synth[ch].run(ss)
        pcm_parts.append(frame_pcm)
        reservoir = (reservoir + new_main)[-511:]

    pcm = np.concatenate(pcm_parts, axis=0)
    ipcm = np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype(np.int16)
    if nch == 1:
        ipcm = ipcm[:, 0]
    return sr, 2, ipcm


def probe_mp3(data: bytes) -> dict:
    """Cheap stream inspection without full decode: frame count,
    duration, layout, and which Huffman tables the stream selects
    (so callers can know up front whether decode_mp3 will refuse)."""
    frames = list(iter_frames(data))
    if not frames:
        raise Mp3Error("no MPEG-1 Layer III frames found")
    used: set[int] = set()
    for h, pos in frames:
        si = _parse_side_info(data, pos + 4 + (2 if h["crc"] else 0), h["nch"])
        for gr in si["granules"]:
            for g in gr:
                for t in g["table_select"]:
                    if t:
                        used.add(t)
    h0 = frames[0][0]
    missing = sorted(t for t in used if t not in LINBITS)
    return {
        "frames": len(frames),
        "samplerate": h0["samplerate"],
        "channels": h0["nch"],
        "duration_s": len(frames) * 1152 / h0["samplerate"],
        "tables_used": sorted(used),
        "tables_missing": missing,
        "decodable": not missing,
    }


def validate_stream(data: bytes) -> dict:
    """Walk EVERY granule of a stream through the side-info +
    scalefactor + Huffman layers, asserting the exact part2_3_length
    bit budget for each granule whose regions all use verified tables
    (others are skipped by jumping the known budget). Real-encoder
    validation of the shipped tables: a wrong code length cannot hit
    the exact budget across many independent granules."""
    frames = list(iter_frames(data))
    if not frames:
        raise Mp3Error("no MPEG-1 Layer III frames found")
    nch = frames[0][0]["nch"]
    sr = frames[0][0]["samplerate"]
    reservoir = b""
    stats = {"granules": 0, "checked": 0, "budget_exact": 0,
             "skipped_missing_table": 0, "reservoir_underruns": 0,
             "errors": 0}
    for h, pos in frames:
        if h["nch"] != nch or h["samplerate"] != sr:
            raise Mp3Error("samplerate/channel change mid-stream")
        si_off = pos + 4 + (2 if h["crc"] else 0)
        si_len = 17 if nch == 1 else 32
        si = _parse_side_info(data, si_off, nch)
        new_main = data[si_off + si_len: pos + h["frame_len"]]
        if si["main_data_begin"] > len(reservoir):
            stats["reservoir_underruns"] += 1
            reservoir = (reservoir + new_main)[-511:]
            continue
        main = (reservoir[len(reservoir) - si["main_data_begin"]:]
                if si["main_data_begin"] else b"") + new_main
        br = _Bits(main, 0)
        prev_sf = [None] * nch
        for gr in range(2):
            for ch in range(nch):
                g = si["granules"][gr][ch]
                stats["granules"] += 1
                part2_3_end = br.pos + g["part2_3_length"]
                sf = _read_scalefactors(br, g, si["scfsi"][ch],
                                        prev_sf[ch] if gr == 1 else None)
                if gr == 0:
                    prev_sf[ch] = sf
                usable = all(
                    t == 0 or t in LINBITS for t in g["table_select"]
                )
                if not usable:
                    stats["skipped_missing_table"] += 1
                    br.pos = part2_3_end
                    continue
                stats["checked"] += 1
                try:
                    _decode_spectrum(br, g, sr, part2_3_end)
                    stats["budget_exact"] += 1
                except Mp3Error:
                    stats["errors"] += 1
                    br.pos = part2_3_end
        reservoir = (reservoir + new_main)[-511:]
    return stats


# ------------------------------------------- subset encoder (fixtures)

class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def to_bytes(self, pad_to: int | None = None) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to is not None:
            out.extend(b"\x00" * (pad_to - len(out)))
        return bytes(out)


def encode_mp3_subset(
    pairs_per_frame: "list[list[tuple[int, int]]]", global_gain: int = 210,
    samplerate: int = 44100,
) -> bytes:
    """Minimal MPEG-1 Layer III ENCODER over the verified-table subset
    (fixture generator, the audio analog of codecs.avi.encode_mjpeg_avi):
    mono 320 kbps long-block frames at 44.1/48/32 kHz whose big-value
    region carries the given integer (x, y) spectral pairs (|v| <= 5,
    Huffman table 9), zero scalefactors, no count1 region. Output
    decodes with ``decode_mp3`` to exactly the requantized spectrum —
    used by the roundtrip tests and driver query to exercise the full
    bitstream path end-to-end without external encoders."""
    if samplerate not in _SAMPLERATES:
        raise ValueError("MPEG-1 samplerates: 44100/48000/32000")
    sr_idx = _SAMPLERATES.index(samplerate)
    # big values must stay inside region0 (= sfb_long[16] lines)
    max_pairs = SFB_LONG[samplerate][16] // 2
    enc9 = {xy: lc for lc, xy in HUFF_TABLES[9].items()}
    frames = []
    for pairs in pairs_per_frame:
        if len(pairs) > max_pairs:
            raise ValueError(
                f"subset encoder: at most {max_pairs} pairs per granule "
                f"at {samplerate} Hz (region0 cap)"
            )
        payload = _BitWriter()
        granule_bits = []
        for _gr in range(2):
            start = len(payload.bits)
            for x, y in pairs:
                if abs(x) > 5 or abs(y) > 5:
                    raise ValueError("subset encoder: |value| <= 5 (table 9)")
                hlen, hcod = enc9[(abs(x), abs(y))]
                payload.write(hcod, hlen)
                if x:
                    payload.write(1 if x < 0 else 0, 1)
                if y:
                    payload.write(1 if y < 0 else 0, 1)
            granule_bits.append(len(payload.bits) - start)
        side = _BitWriter()
        side.write(0, 9)
        side.write(0, 5)
        side.write(0, 4)
        for gr in range(2):
            side.write(granule_bits[gr], 12)
            side.write(len(pairs), 9)
            side.write(global_gain, 8)
            side.write(0, 4)
            side.write(0, 1)
            for _ in range(3):
                side.write(9, 5)
            side.write(15, 4)
            side.write(0, 3)
            side.write(0, 1)
            side.write(0, 1)
            side.write(0, 1)
        frame_len = 144 * 320000 // samplerate
        header = bytes([0xFF, 0xFB, 0xE0 | (sr_idx << 2), 0xC0])
        frames.append(
            header
            + side.to_bytes()
            + payload.to_bytes(pad_to=frame_len - 4 - 17)
        )
    return b"".join(frames)
