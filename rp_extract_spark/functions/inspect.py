"""Feature-inspection surface — the headless analog of the
reference's plotting module (``/root/reference/rp_plot.py``).

The reference couples three reusable data transforms to matplotlib
calls; this module ships the transforms without the rendering (a
distributed engine has no display): the Fortran-order reshape contract
for every descriptor family (``rp_plot.py:27-31``, ``:33-41``, and the
reshape examples ``:200-208``), the Rhythm-Histogram bpm axis
(``rp_plot.py:44-59``), and the log-frequency bin regrouping used by
the spectrogram view (``rp_plot.py:113-139`` ``logscale_spec``).

``feature_matrix_df`` lifts the reshape to a relational view — one row
per (id, band, column) cell — so feature matrices can be inspected,
joined, or exported with plain SQL instead of imshow.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kernel import MOD_FREQ_RES

# (rows, cols) of each descriptor family's matrix view; flattened
# Fortran-order per the parity contract (rp_extract.py:451
# FLATTEN_ORDER='F'; reshape-on-read-back rp_plot.py:28,34)
FEATURE_SHAPES: dict[str, tuple[int, int]] = {
    "rp": (24, 60),
    "ssd": (24, 7),
    "mvd": (60, 7),
    "tssd": (168, 7),
    "trh": (60, 7),
}

SSD_STAT_NAMES = ["mean", "var", "skew", "kurt", "median", "min", "max"]


def reshape_feature(vec: np.ndarray, feature: str) -> np.ndarray:
    """1-D descriptor vector → its 2-D matrix view (F-order), e.g.
    rp (1440,) → (24 bark bands, 60 modulation bins). Matches
    ``features.reshape(rows, cols, order='F')`` in rp_plot.py:28."""
    if feature not in FEATURE_SHAPES:
        raise ValueError(f"unknown matrix feature {feature!r} "
                         f"(one of {sorted(FEATURE_SHAPES)})")
    rows, cols = FEATURE_SHAPES[feature]
    v = np.asarray(vec)
    if v.shape != (rows * cols,):
        raise ValueError(f"{feature} expects length {rows * cols}, "
                         f"got {v.shape}")
    return v.reshape(rows, cols, order="F")


def rh_bpm_axis(n: int = 60, step: int = 5) -> tuple[list[int], list[int]]:
    """Rhythm-Histogram bpm tick axis (rp_plot.py:48-55): tick
    positions every ``step`` bins and their rounded bpm labels,
    bpm = (index + 1) * mod_freq_res * 60."""
    idx = list(range(0, n + 1, step))
    bpm = [int(b) for b in np.around(
        (np.asarray(idx) + 1) * MOD_FREQ_RES * 60.0, 0).astype(int)]
    return idx, bpm


def logscale_bins(freqbins: int, sr: int = 44100, factor: float = 20.0):
    """Log-frequency regrouping plan (rp_plot.py:115-139
    ``logscale_spec`` minus the rendering): returns (bin_starts,
    center_freqs) — bin i of the regrouped spectrogram sums original
    bins [starts[i], starts[i+1]) (last bin runs to the end), and
    center_freqs are the mean FFT frequencies of each group."""
    scale = np.linspace(0, 1, freqbins) ** factor
    scale *= (freqbins - 1) / max(scale)
    scale = np.unique(np.round(scale)).astype(int)
    allfreqs = np.abs(np.fft.fftfreq(freqbins * 2, 1.0 / sr)[: freqbins + 1])
    freqs = []
    for i in range(len(scale)):
        hi = None if i == len(scale) - 1 else scale[i + 1]
        freqs.append(float(np.mean(allfreqs[scale[i]: hi])))
    return scale.tolist(), freqs


def apply_logscale(spec: np.ndarray, sr: int = 44100,
                   factor: float = 20.0):
    """Regroup a (timebins, freqbins) spectrogram onto the log-scale
    plan — the data half of rp_plot's logscale_spec, numerically
    identical (sum over each bin group)."""
    timebins, freqbins = spec.shape
    starts, freqs = logscale_bins(freqbins, sr, factor)
    out = np.zeros((timebins, len(starts)), dtype=spec.dtype)
    for i, lo in enumerate(starts):
        hi = None if i == len(starts) - 1 else starts[i + 1]
        out[:, i] = spec[:, lo:hi].sum(axis=1)
    return out, freqs


def feature_matrix_df(
    df: DataFrame,
    feature: str,
    id_col: str = "entity_id",
) -> DataFrame:
    """Relational matrix view of a descriptor column: one row per
    (id, band, col, val) cell with the F-order index mapping
    ``flat_idx = band + col * rows`` — the SQL-facing analog of
    plotrp/plotssd's reshape. JVM-side posexplode; no Python."""
    rows, cols = FEATURE_SHAPES[feature]
    e = df.select(
        F.col(id_col), F.posexplode(F.col(feature)).alias("pos", "v")
    )
    return e.select(
        id_col,
        F.pmod("pos", F.lit(rows)).cast("int").alias("band"),
        F.floor(F.col("pos") / rows).cast("int").alias("mcol"),
        F.col("v").alias("val"),
    )
