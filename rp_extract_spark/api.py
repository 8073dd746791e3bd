"""Drop-in reference-compatible API.

A user of the reference calls ``rp_extract(wavedata, samplerate,
extract_rp=True, ...)`` (rp_extract.py:380-803) and gets a dict of
descriptor vectors. This module provides the same function — same
name, same keyword surface, same return-dict keys and shapes, same
numerics (parity-tested at rtol 1e-8 in tests/test_audio_parity.py /
test_api_compat.py) — backed by the engine's kernel, so existing
reference code can switch imports and run unchanged. The distributed
versions of the same computation are ``operators.multimodal.
extract_features_audio`` (DataFrame in, DataFrame out) and the image
graft ``operators.extract.extract_features``.
"""

from __future__ import annotations

import numpy as np


def rp_extract(
    wavedata,
    samplerate,
    extract_rp=False,
    extract_ssd=False,
    extract_tssd=False,
    extract_rh=False,
    extract_rh2=False,
    extract_trh=False,
    extract_mvd=False,
    skip_leadin_fadeout=1,
    step_width=1,
    n_bark_bands=24,
    mod_ampl_limit=60,
    transform_bark=True,
    spectral_masking=True,
    transform_db=True,
    transform_phon=True,
    transform_sone=True,
    fluctuation_strength_weighting=True,
    return_segment_features=False,
    verbose=False,
) -> dict[str, np.ndarray]:
    """Reference-signature feature extraction (rp_extract.py:380-803).

    Differences from the reference, by design: ``extract_rh2`` actually
    returns the post-weighting histogram (the reference computes but
    never returns it — rp_extract.py:745-747 vs :765-800), aggregated
    by exact median like RH.
    """
    from .functions.audio import segment_feature_stack
    from .functions.kernel import aggregate_segments

    plan, segs = segment_feature_stack(
        wavedata, samplerate, skip_leadin_fadeout, step_width,
        n_bark_bands=n_bark_bands, mod_ampl_limit=mod_ampl_limit,
        transform_bark=transform_bark, spectral_masking=spectral_masking,
        do_transform_db=transform_db, do_transform_phon=transform_phon,
        do_transform_sone=transform_sone,
        fluctuation_strength_weighting=fluctuation_strength_weighting,
    )
    if verbose:
        print(f"Analyzing {plan['n_segments']} segments")
    features: dict[str, np.ndarray] = {}
    if return_segment_features:
        if extract_rp:
            features["rp"] = np.stack([s["rp"] for s in segs])
        if extract_ssd:
            features["ssd"] = np.stack([s["ssd"] for s in segs])
        if extract_rh:
            features["rh"] = np.stack([s["rh"] for s in segs])
        if extract_rh2:
            features["rh2"] = np.stack([s["rh2"] for s in segs])
        if extract_mvd:
            features["mvd"] = np.stack([s["mvd"] for s in segs])
    else:
        if extract_rp:
            features["rp"] = np.median(np.stack([s["rp"] for s in segs]), axis=0)
        if extract_ssd:
            features["ssd"] = np.mean(np.stack([s["ssd"] for s in segs]), axis=0)
        if extract_rh:
            features["rh"] = np.median(np.stack([s["rh"] for s in segs]), axis=0)
        if extract_rh2:
            features["rh2"] = np.median(np.stack([s["rh2"] for s in segs]), axis=0)
        if extract_mvd:
            features["mvd"] = np.mean(np.stack([s["mvd"] for s in segs]), axis=0)
    if extract_tssd or extract_trh:
        agg = aggregate_segments(
            np.stack([s["rp"] for s in segs]),
            np.stack([s["ssd"] for s in segs]),
            np.stack([s["rh"] for s in segs]),
            np.stack([s["mvd"] for s in segs]),
        )
        if extract_tssd:
            features["tssd"] = agg["tssd"]
        if extract_trh:
            features["trh"] = agg["trh"]
    if return_segment_features:
        features["segpos"] = plan["positions"]
        features["timepos"] = plan["timepos"]
    return features


def available_feature_types() -> list[str]:
    """rp_extract.py:805-807 analog (plus rh2, which we actually return)."""
    return ["rp", "ssd", "rh", "rh2", "tssd", "trh", "mvd"]
