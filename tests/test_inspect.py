"""Inspection-surface tests (rp_plot.py analog): F-order reshape
contract, bpm axis, log-frequency regrouping, relational matrix view.
The reference's rp_plot imports matplotlib (absent here), so the
numeric expectations are re-derived independently in the tests from
the same published formulas the module cites."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.functions.inspect import (
    FEATURE_SHAPES,
    apply_logscale,
    feature_matrix_df,
    logscale_bins,
    reshape_feature,
    rh_bpm_axis,
)
from rp_extract_spark.functions.kernel import MOD_FREQ_RES


def test_reshape_matches_forder_contract():
    for feat, (rows, cols) in FEATURE_SHAPES.items():
        vec = np.arange(rows * cols, dtype=float)
        m = reshape_feature(vec, feat)
        assert m.shape == (rows, cols)
        # rp_plot.py:28 contract: reshape(rows, cols, order='F')
        assert np.array_equal(m, vec.reshape(rows, cols, order="F"))
        # roundtrip through the kernel's flatten convention
        assert np.array_equal(m.flatten("F"), vec)


def test_reshape_rejects_bad_input():
    with pytest.raises(ValueError):
        reshape_feature(np.zeros(10), "rp")
    with pytest.raises(ValueError):
        reshape_feature(np.zeros(1440), "nope")


def test_rh_bpm_axis_matches_reference_formula():
    # rp_plot.py:50-53: mod_freq_res = 1/(2**18/44100);
    # bpm = around((index + 1) * res * 60)
    idx, bpm = rh_bpm_axis(60, 5)
    res = 1.0 / (2**18 / 44100.0)
    assert abs(MOD_FREQ_RES - res) < 1e-12
    assert idx == list(range(0, 61, 5))
    expect = np.around((np.array(idx) + 1) * res * 60, 0).astype(int)
    assert bpm == expect.tolist()


def test_logscale_bins_and_apply():
    """Independent re-derivation of rp_plot.py:115-139: group starts
    are the unique rounded power-curve positions; each output bin sums
    its group; center freqs are group means of the rfft axis."""
    freqbins, sr, factor = 64, 44100, 20.0
    starts, freqs = logscale_bins(freqbins, sr, factor)
    scale = np.linspace(0, 1, freqbins) ** factor
    scale *= (freqbins - 1) / max(scale)
    expect_starts = np.unique(np.round(scale)).astype(int)
    assert starts == expect_starts.tolist()
    allfreqs = np.abs(np.fft.fftfreq(freqbins * 2, 1.0 / sr)[: freqbins + 1])
    for i, lo in enumerate(starts):
        hi = None if i == len(starts) - 1 else starts[i + 1]
        assert freqs[i] == pytest.approx(float(np.mean(allfreqs[lo:hi])))
    rng = np.random.default_rng(3)
    spec = rng.normal(size=(12, freqbins))
    out, f2 = apply_logscale(spec, sr, factor)
    assert f2 == freqs and out.shape == (12, len(starts))
    for i, lo in enumerate(starts):
        hi = None if i == len(starts) - 1 else starts[i + 1]
        assert np.allclose(out[:, i], spec[:, lo:hi].sum(axis=1))


def test_feature_matrix_df_forder_mapping(spark):
    rows, cols = FEATURE_SHAPES["ssd"]
    vec = np.arange(rows * cols, dtype=float)
    df = spark.createDataFrame(
        [("e1", vec.tolist())], "entity_id string, ssd array<double>"
    )
    out = feature_matrix_df(df, "ssd").collect()
    assert len(out) == rows * cols
    m = reshape_feature(vec, "ssd")
    for r in out:
        assert m[r.band, r.mcol] == r.val
    # every cell addressed exactly once
    assert len({(r.band, r.mcol) for r in out}) == rows * cols
