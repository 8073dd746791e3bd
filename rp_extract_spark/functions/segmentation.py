"""Tumbling segmentation plan — exact reference semantics (W1).

Replicates the reference's segment planner
(``/root/reference/rp_extract.py:455-514``): sample-rate-dependent
segment sizes, lead-in/fade-out skipping, stride, the short-input
parameter rewrite (duration < 45 s forces step=1/skip=0,
rp_extract.py:493-501) and the exact segment-count formula
(rp_extract.py:508). Used for timeline-window planning and for tiling
very wide images into column segments; golden-tested against the
reference's documented 7-segment example (rp_extract.py:429).
"""

from __future__ import annotations

import numpy as np

SEGMENT_SIZES = {11025: 2**16, 22050: 2**17, 44100: 2**18}
FFT_WINDOW_SIZES = {11025: 256, 22050: 512, 44100: 1024}


def segment_plan(
    n_samples: int,
    samplerate: int = 44100,
    skip_leadin_fadeout: int = 1,
    step_width: int = 1,
) -> dict:
    """Segment positions and metadata for one signal.

    Returns {segment_size, fft_window_size, n_segments, positions,
    timepos} where positions is an (n_segments, 2) array of 1-based
    inclusive sample ranges (the reference's seg_pos convention,
    rp_extract.py:462,530-533) and timepos = positions / samplerate
    (rp_extract.py:800)."""
    if samplerate not in SEGMENT_SIZES:
        raise ValueError(
            f"sample rate {samplerate} not supported (only 11/22/44 kHz)"
        )
    segment_size = SEGMENT_SIZES[samplerate]
    skip_seg = skip_leadin_fadeout
    seg_pos = np.array([1, segment_size], dtype=np.int64)

    if skip_leadin_fadeout > 0 or step_width > 1:
        duration = n_samples / samplerate
        if duration < 45:
            step_width = 1
            skip_seg = 0
        else:
            seg_pos = seg_pos + segment_size * skip_seg

    n_segments = int(
        np.floor(
            (np.floor((n_samples - skip_seg * 2 * segment_size) / segment_size) - 1)
            / step_width
        )
        + 1
    )
    if n_segments <= 0:
        raise ValueError(
            f"not enough data: need at least {segment_size} samples, got {n_samples}"
        )
    positions = np.stack(
        [seg_pos + segment_size * step_width * i for i in range(n_segments)]
    )
    return {
        "segment_size": segment_size,
        "fft_window_size": FFT_WINDOW_SIZES[samplerate],
        "n_segments": n_segments,
        "positions": positions,
        "timepos": positions / float(samplerate),
    }


def tile_columns(
    gray: np.ndarray,
    tile_w: int,
    skip_leadin_fadeout: int = 0,
    step_width: int = 1,
) -> list[np.ndarray]:
    """Tile a (very wide) image's columns into fixed-width segments
    using the same plan arithmetic — the pixel-grid analog of W1 for
    inputs too wide for one kernel pass."""
    w = gray.shape[-1]
    skip = skip_leadin_fadeout
    start = skip * tile_w
    n = int(np.floor((np.floor((w - skip * 2 * tile_w) / tile_w) - 1) / step_width) + 1)
    if n <= 0:
        raise ValueError(f"image width {w} too small for tile width {tile_w}")
    return [
        gray[..., start + i * step_width * tile_w : start + i * step_width * tile_w + tile_w]
        for i in range(n)
    ]
