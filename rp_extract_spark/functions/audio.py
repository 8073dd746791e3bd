"""TRUE audio descriptor path: WAV samples → spectrogram → kernel.

Round 1 grafted the kernel onto images (pixels play the spectrogram's
role, SURVEY.md §1.1). This module closes the loop for the reference's
ACTUAL input modality: PCM audio. It replicates, exactly:

* ``periodogram`` (rp_extract.py:128-166) including the even-nfft
  quirk — the mirrored spectrum is NOT halved inside the function and
  bins ``1:-2`` (not ``1:-1``) are doubled;
* ``calc_spectrogram`` (rp_extract.py:171-213): 50% hop Hanning
  windowing, one periodogram column per frame (vectorized here as one
  batched FFT over all frames);
* the half-spectrum cut + Hz ``freq_axis`` (rp_extract.py:470-474,
  566-573) and ``transform2bark`` over real frequency ranges
  (rp_extract.py:286-304 — bands above Nyquist stay zero rows,
  faithfully);
* the segment iteration (via functions/segmentation.segment_plan) and
  the waveform-side hearing-threshold scaling (rp_extract.py:525,545).

Downstream of the banded sonogram the pipeline is byte-identical to
the image graft (`kernel._from_banded`), with the modulation-frequency
resolution ``samplerate / segment_size`` (rp_extract.py:730).
Parity: tests/test_audio_parity.py runs the reference's own
``rp_extract()`` entry point (imported as oracle) on synthesized PCM
and compares every descriptor family allclose.
"""

from __future__ import annotations

import numpy as np

from .kernel import (
    BARK_LIMITS,
    HEARING_THRESHOLD_FACTOR,
    MOD_AMPL_LIMIT,
    N_BANDS,
    _from_banded,
)
from .segmentation import SEGMENT_SIZES, segment_plan


def periodogram_frames(frames: np.ndarray, win: np.ndarray) -> np.ndarray:
    """Reference periodogram for a stack of frames (n_frames, nfft):
    |FFT(x*win)|²/(win·win), even-nfft doubling of bins 1..nfft-3, and
    the 1/(2π) scale (rp_extract.py:128-166). Returns (n_frames, nfft)."""
    nfft = win.size
    U = float(win @ win)
    X = np.fft.fft(frames * win, n=nfft, axis=-1)
    P = (X.real * X.real + X.imag * X.imag) / U
    if nfft % 2 != 0:
        raise ValueError("odd nfft path unused by the reference (fft sizes are 2^k)")
    P[..., 1:-2] *= 2.0  # verbatim quirk: last TWO bins not doubled
    return P / (2.0 * np.pi)


def calc_spectrogram(wavsegment: np.ndarray, fft_window_size: int) -> np.ndarray:
    """(fft_window_size, n_frames) magnitude spectrogram with 50%
    overlap Hanning frames (rp_extract.py:171-213)."""
    hop = int(fft_window_size * 0.5)
    n_frames = int((wavsegment.shape[0] - fft_window_size) / hop + 1)
    if n_frames < 1:
        raise ValueError("segment shorter than one FFT window")
    idx = np.arange(n_frames)[:, None] * hop + np.arange(fft_window_size)[None, :]
    frames = wavsegment[idx]
    han = np.hanning(fft_window_size)
    return periodogram_frames(frames, han).T  # (nfft, n_frames)


def bark_matrix_hz(freq_axis: np.ndarray, max_bands: int = N_BANDS) -> np.ndarray:
    """(max_bands, n_freq) 0/1 aggregation matrix over REAL frequency
    ranges: band b sums bins with barks[b] <= f < barks[b+1]
    (rp_extract.py:286-304; barks prepends 0). Bands entirely above
    Nyquist remain zero rows, exactly like the reference; requests for
    more than 24 bands clamp to 24 (rp_extract.py:289-293
    ``min(n_bark_bands, max_bands)``)."""
    barks = np.concatenate(([0.0], BARK_LIMITS))
    max_bands = min(max_bands, BARK_LIMITS.size)
    m = np.zeros((max_bands, freq_axis.size))
    for b in range(max_bands):
        m[b, (freq_axis >= barks[b]) & (freq_axis < barks[b + 1])] = 1.0
    return m


def extract_audio_segment_features(
    wavsegment: np.ndarray,
    samplerate: int,
    n_bark_bands: int = N_BANDS,
    mod_ampl_limit: int = MOD_AMPL_LIMIT,
    transform_bark: bool = True,
    spectral_masking: bool = True,
    do_transform_db: bool = True,
    do_transform_phon: bool = True,
    do_transform_sone: bool = True,
    fluctuation_strength_weighting: bool = True,
) -> dict[str, np.ndarray]:
    """One audio segment → {rp, ssd, rh, rh2, mvd} with exact reference
    semantics (segment expected to be ``segment_size`` samples of
    normalized mono PCM)."""
    from .segmentation import FFT_WINDOW_SIZES

    if samplerate not in FFT_WINDOW_SIZES:
        raise ValueError(f"sample rate {samplerate} not supported")
    nfft = FFT_WINDOW_SIZES[samplerate]
    seg = np.asarray(wavsegment, dtype=np.float64) * HEARING_THRESHOLD_FACTOR
    spec = calc_spectrogram(seg, nfft)
    n_freq = nfft // 2 + 1
    matrix = spec[:n_freq, :]
    if transform_bark:
        freq_axis = np.linspace(0.0, samplerate / 2.0, n_freq, endpoint=True)
        matrix = bark_matrix_hz(freq_axis, n_bark_bands) @ matrix
    mod_freq_res = float(samplerate) / SEGMENT_SIZES[samplerate]
    return _from_banded(
        matrix, mod_ampl_limit, spectral_masking, do_transform_db,
        do_transform_phon, do_transform_sone, fluctuation_strength_weighting,
        mod_freq_res=mod_freq_res,
    )


def segment_feature_stack(
    wavedata: np.ndarray,
    samplerate: int,
    skip_leadin_fadeout: int = 1,
    step_width: int = 1,
    **flags,
) -> tuple[dict, list[dict[str, np.ndarray]]]:
    """Shared front half of full-clip extraction: mono mixdown
    (rp_extract.py:477-481), segment plan (incl. the <45 s rewrite),
    per-segment kernel. Returns (plan, per-segment feature dicts) —
    consumed by both ``extract_audio_features`` and the drop-in
    ``api.rp_extract``."""
    wd = np.asarray(wavedata, dtype=np.float64)
    if wd.ndim > 1:
        wd = wd[:, 0] if wd.shape[1] == 1 else wd.mean(axis=1)
    plan = segment_plan(wd.shape[0], samplerate, skip_leadin_fadeout, step_width)
    segs = [
        extract_audio_segment_features(wd[p[0] - 1 : p[1]], samplerate, **flags)
        for p in plan["positions"]
    ]
    return plan, segs


def extract_audio_features(
    wavedata: np.ndarray,
    samplerate: int,
    skip_leadin_fadeout: int = 1,
    step_width: int = 1,
    **flags,
) -> dict[str, np.ndarray]:
    """Full-clip extraction mirroring ``rp_extract()``
    (rp_extract.py:380-760): mono mixdown, segment plan (incl. the
    <45 s rewrite), per-segment kernel, then the reference's
    aggregation — exact median for RP/RH(2), mean for SSD/MVD, plus
    temporal TSSD/TRH over the per-segment stacks."""
    from .kernel import aggregate_segments

    _plan, segs = segment_feature_stack(
        wavedata, samplerate, skip_leadin_fadeout, step_width, **flags
    )
    out = aggregate_segments(
        np.stack([s["rp"] for s in segs]),
        np.stack([s["ssd"] for s in segs]),
        np.stack([s["rh"] for s in segs]),
        np.stack([s["mvd"] for s in segs]),
    )
    # rh2 aggregates like rh: exact median (rp_extract.py:784-791)
    out["rh2"] = np.median(np.stack([s["rh2"] for s in segs]), axis=0)
    return out


def resample_fft(samples: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Band-limited FFT resampling (scipy.signal.resample semantics,
    implemented directly on numpy FFTs). The reference shells out to
    ffmpeg for this (audiofile_read.py:96-125 resample); a numpy
    resampler keeps the auto-resample behavior self-contained on
    executors. Mono 1-D or (n, ch) 2-D."""
    x = np.asarray(samples, dtype=np.float64)
    n = x.shape[0]
    m = int(round(n * sr_to / sr_from))
    X = np.fft.rfft(x, axis=0)
    out_bins = m // 2 + 1
    if out_bins <= X.shape[0]:
        Y = X[:out_bins]
    else:
        pad = [(0, out_bins - X.shape[0])] + [(0, 0)] * (X.ndim - 1)
        Y = np.pad(X, pad)
    y = np.fft.irfft(Y, n=m, axis=0)
    return y * (m / n)


def auto_resample(samples: np.ndarray, samplerate: int) -> tuple[int, np.ndarray]:
    """wav_read's auto-resample rule (audiofile_read.py:68-74): rates
    other than 11025/22050/44100 are resampled to 22050 when the input
    rate is below 22050, else to 44100 (``to_samplerate = 22050 if
    samplerate < 22050 else 44100``) before extraction."""
    if samplerate in SEGMENT_SIZES:
        return samplerate, np.asarray(samples, dtype=np.float64)
    to = 22050 if samplerate < 22050 else 44100
    return to, resample_fft(samples, samplerate, to)


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False): linear below
    1 kHz, logarithmic above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    return np.where(
        log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


def mel_matrix(
    samplerate: int, n_fft: int, n_mels: int = 80,
    fmin: float = 0.0, fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank — the same
    construction as ``librosa.filters.mel(htk=False, norm='slaney')``
    that the reference's (dead-code, librosa-dependent) transform2mel
    calls (rp_extract.py:240-277). Shape (n_mels, n_fft//2 + 1)."""
    if fmax is None:
        fmax = samplerate / 2.0
    fftfreqs = np.linspace(0.0, samplerate / 2.0, 1 + n_fft // 2, endpoint=True)
    mel_pts = _mel_to_hz(
        np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    )
    lower = (fftfreqs[None, :] - mel_pts[:-2, None]) / (
        mel_pts[1:-1] - mel_pts[:-2]
    )[:, None]
    upper = (mel_pts[2:, None] - fftfreqs[None, :]) / (
        mel_pts[2:] - mel_pts[1:-1]
    )[:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney norm: each filter integrates to ~constant energy
    enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])
    return weights * enorm[:, None]


def transform2mel(
    spectrogram: np.ndarray,
    samplerate: int,
    fft_window_size: int,
    n_mel_bands: int = 80,
    freq_min: float = 0.0,
    freq_max: float | None = None,
) -> np.ndarray:
    """Mel-scale spectrogram (reference transform2mel semantics,
    rp_extract.py:240-277 — marked "NOT USED" there and dependent on
    librosa; the filterbank is built in-repo instead)."""
    basis = mel_matrix(samplerate, fft_window_size, n_mel_bands,
                       freq_min, freq_max)
    return basis @ spectrogram[: basis.shape[1], :]
