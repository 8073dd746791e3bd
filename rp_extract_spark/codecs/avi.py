"""Minimal AVI (RIFF) container mux/demux for Motion-JPEG video.

Combines the two codecs already in the repo: RIFF chunk walking (as in
codecs/wav.py) and the baseline JPEG codec (codecs/jpeg.py). An MJPEG
AVI is the classic "video = a RIFF list of JPEG frames" format — the
muxer writes spec-shaped ``hdrl`` (avih/strh/strf) headers, a ``movi``
list of ``00dc`` frame chunks and an ``idx1`` index; the demuxer walks
any AVI and returns the compressed frame payloads from the first video
stream. This retires the video-decode stub for MJPEG content; other
codecs (H.264 etc.) genuinely need ffmpeg and stay quarantined.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def encode_mjpeg_avi(
    frames: list[np.ndarray], fps: int = 30, quality: int = 90
) -> bytes:
    """Mux grayscale frames as an MJPEG AVI (each frame JPEG-encoded
    with the in-repo baseline codec)."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(np.asarray(f, dtype=np.uint8), quality) for f in frames]
    max_size = max(len(p) for p in payloads)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, max_size * fps, 0, 0x10,  # us/frame, rate, pad, HASINDEX
        len(frames), 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0,      # type, handler, flags, prio, lang
        0, 1, fps, 0, len(frames),      # init, scale, rate, start, length
        max_size, 0xFFFFFFFF, 0,        # sugg_buffer, quality, samplesize
        0, 0, w, h,                     # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", p) for p in payloads)
    movi = _list(b"movi", movi_body)

    idx_entries = []
    off = 4  # offsets are relative to the start of 'movi' subtype
    for p in payloads:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_avi(data: bytes) -> tuple[float, list[bytes]]:
    """Walk an AVI and return (fps, [compressed frame payloads]) of the
    first video stream. Works on any AVI whose frames live in standard
    ``..dc``/``..db`` movi chunks (MJPEG payloads decode with
    codecs/jpeg.py; other codecs need an external decoder)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    fps = 0.0
    frames: list[bytes] = []
    n_streams = 0          # strh chunks seen, in strl order = stream index
    video_stream = -1      # index of the FIRST vids stream
    vid_prefix = b"00"     # two-digit chunk prefix of that stream

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps, n_streams, video_stream, vid_prefix
        end = min(end, len(buf))  # truncated streams: never read past EOF
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", buf, pos)
            body_start = pos + 8
            if cid == b"LIST":
                subtype = buf[body_start:body_start + 4]
                if subtype in (b"hdrl", b"strl", b"movi"):
                    walk(buf, body_start + 4, body_start + size)
            elif cid == b"strh":
                # every strh advances the stream index, even a malformed
                # one — otherwise later streams' chunk prefixes desync
                if size >= 32 and body_start + 28 <= len(buf):
                    fcc_type = buf[body_start:body_start + 4]
                    if fcc_type == b"vids" and video_stream < 0:
                        video_stream = n_streams
                        vid_prefix = b"%02d" % n_streams
                        scale, rate = struct.unpack_from(
                            "<II", buf, body_start + 20)
                        fps = rate / scale if scale else 0.0
                n_streams += 1
            elif (cid[2:4] in (b"dc", b"db") and size > 0
                  and cid[:2] == vid_prefix):
                # only the first video stream's chunks (e.g. 00dc); an AVI
                # with an audio stream or a second video stream must not
                # interleave foreign payloads into the frame list
                frames.append(buf[body_start:body_start + size])
            pos = body_start + size + (size & 1)

    walk(data, 12, len(data))
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return fps, frames
