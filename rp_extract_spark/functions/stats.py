"""The 7-statistic descriptor block.

Semantics match the reference's ``calc_statistical_features``
(``/root/reference/rp_extract.py:218-232``): per matrix row compute
``mean, var, skew, kurtosis, median, min, max`` with the exact
conventions that matter for allclose parity:

* variance: population (ddof=0) — numpy default;
* skewness: biased Fisher-Pearson g1 = m3 / m2^1.5 (scipy default);
* kurtosis: **Pearson** (not excess): m4 / m2^2 (scipy fisher=False);
* median: exact;
* any NaN in the result (e.g. zero-variance rows) → 0.

Implemented from the published moment formulas with numpy only (no
scipy in this container).
"""

from __future__ import annotations

import numpy as np

N_STATS = 7


def stat_features(matrix: np.ndarray) -> np.ndarray:
    """(n_rows, n_cols) -> (n_rows, 7) float64, NaN→0."""
    m = np.asarray(matrix, dtype=np.float64)
    if m.ndim != 2:
        raise ValueError("stat_features expects a 2-D matrix")
    return stat_features_nd(m)


def stat_features_nd(m: np.ndarray) -> np.ndarray:
    """7-stat block over the LAST axis of an n-d array:
    (..., n_cols) -> (..., 7). Same conventions as ``stat_features``;
    used to batch the kernel across stacked same-shape images."""
    mean = m.mean(axis=-1)
    centered = m - mean[..., None]
    c2 = centered * centered  # explicit multiplies beat np.power here
    c3 = c2 * centered
    m2 = np.mean(c2, axis=-1)  # population variance
    m3 = np.mean(c3, axis=-1)
    m4 = np.mean(c3 * centered, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        skew = m3 / (m2 * np.sqrt(m2))
        kurt = m4 / (m2 * m2)  # Pearson kurtosis (normal -> 3.0)
    out = np.empty(m.shape[:-1] + (N_STATS,), dtype=np.float64)
    out[..., 0] = mean
    out[..., 1] = m2
    out[..., 2] = skew
    out[..., 3] = kurt
    out[..., 4] = np.median(m, axis=-1)
    out[..., 5] = m.min(axis=-1)
    out[..., 6] = m.max(axis=-1)
    np.nan_to_num(out, copy=False, nan=0.0, posinf=0.0, neginf=0.0)
    return out
