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
    mean = m.mean(axis=1)
    centered = m - mean[:, None]
    m2 = np.mean(centered**2, axis=1)  # population variance
    m3 = np.mean(centered**3, axis=1)
    m4 = np.mean(centered**4, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        skew = m3 / np.power(m2, 1.5)
        kurt = m4 / (m2 * m2)  # Pearson kurtosis (normal -> 3.0)
    out = np.empty((m.shape[0], N_STATS), dtype=np.float64)
    out[:, 0] = mean
    out[:, 1] = m2
    out[:, 2] = skew
    out[:, 3] = kurt
    out[:, 4] = np.median(m, axis=1)
    out[:, 5] = m.min(axis=1)
    out[:, 6] = m.max(axis=1)
    np.nan_to_num(out, copy=False, nan=0.0, posinf=0.0, neginf=0.0)
    return out
