"""Segment-plan parity: golden values from the reference docs."""

import numpy as np
import pytest

from rp_extract_spark.functions.segmentation import segment_plan, tile_columns


def test_reference_golden_seven_segments():
    # the bundled mp3: 2,421,504 samples @ 44.1 kHz -> "Analyzing 7
    # segments" (rp_extract.py:429, audiofile_read.py:371-372)
    plan = segment_plan(2_421_504, 44100)
    assert plan["n_segments"] == 7
    assert plan["segment_size"] == 2**18
    assert plan["fft_window_size"] == 1024
    # skip_leadin: first segment starts one segment in (1-based)
    assert plan["positions"][0][0] == 2**18 + 1
    assert plan["positions"][0][1] == 2 * 2**18
    # contiguous stride
    assert np.all(np.diff(plan["positions"][:, 0]) == 2**18)
    # timepos convention (rp_extract.py:800)
    assert plan["timepos"][0][0] == pytest.approx((2**18 + 1) / 44100.0)


def test_short_input_rewrites_params():
    # duration < 45 s: skip/step forced off (rp_extract.py:493-501)
    n = 44100 * 30  # 30 s
    plan = segment_plan(n, 44100, skip_leadin_fadeout=1, step_width=2)
    assert plan["positions"][0][0] == 1  # no lead-in skip
    assert plan["n_segments"] == int(np.floor(n / 2**18)) - 1 + 1 - 0  # formula
    # stride is 1 segment despite step_width=2 being requested
    assert np.all(np.diff(plan["positions"][:, 0]) == 2**18)


def test_step_width():
    n = 44100 * 120  # 2 minutes
    p1 = segment_plan(n, 44100, step_width=1)
    p2 = segment_plan(n, 44100, step_width=2)
    assert np.all(np.diff(p2["positions"][:, 0]) == 2 * 2**18)
    assert p2["n_segments"] == int(np.floor((p1["n_segments"] - 1) / 2)) + 1


def test_unsupported_rate_and_too_short():
    with pytest.raises(ValueError):
        segment_plan(10**6, 48000)
    with pytest.raises(ValueError):
        segment_plan(1000, 44100)


def test_tile_columns():
    g = np.arange(48 * 300, dtype=np.float64).reshape(48, 300)
    tiles = tile_columns(g, 64)
    # floor((floor(300/64)-1)/1)+1 = 4 tiles of width 64 from column 0
    assert len(tiles) == 4
    assert all(t.shape == (48, 64) for t in tiles)
    assert np.array_equal(tiles[0], g[:, :64])
    assert np.array_equal(tiles[1], g[:, 64:128])
    # exactly one tile when width == tile width (reference formula)
    assert len(tile_columns(g, 300)) == 1
    with pytest.raises(ValueError):
        tile_columns(g, 301)
