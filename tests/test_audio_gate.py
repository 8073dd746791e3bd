"""Audio quality gate (operators/multimodal.quality_gate_audio):
exact counts and gate decisions against straight-line numpy, with
synthetic WAVs engineered per failure mode."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.codecs.wav import encode_wav
from rp_extract_spark.operators.multimodal import quality_gate_audio


def _clips_df(spark, named):
    rows = [(k, bytearray(encode_wav(np.asarray(v, dtype=np.float32),
                                     8000, samplewidth=4)))
            for k, v in named.items()]
    return spark.createDataFrame(rows, "clip_id string, bytes binary")


def test_gate_reasons_per_failure_mode(spark):
    rng = np.random.RandomState(5)
    good = rng.uniform(-0.5, 0.5, 512)
    clips = {
        "good": good,
        "short": good[:8],
        "clipped": np.where(rng.rand(512) < 0.10, 1.0, 0.1),
        "silent": np.full(512, 1e-6),
        "quiet": np.full(512, 5e-4),
    }
    out = {r["clip_id"]: r for r in quality_gate_audio(
        _clips_df(spark, clips)).collect()}
    assert out["good"]["passes"] and out["good"]["reject_reasons"] == ""
    assert out["short"]["reject_reasons"] == "too_short"
    assert out["clipped"]["reject_reasons"] == "clipped"
    # constant 1e-6 is silent AND has rms below the level gate
    assert out["silent"]["reject_reasons"] == "mostly_silence,too_quiet"
    # 5e-4 is above the silence threshold (1/1024 ~ 9.8e-4)? no — below;
    # both silence and level fire
    assert "too_quiet" in out["quiet"]["reject_reasons"]


def test_gate_counts_match_numpy(spark):
    rng = np.random.RandomState(9)
    v = rng.uniform(-1.2, 1.2, 256).astype(np.float32)
    out = quality_gate_audio(_clips_df(spark, {"c": v})).collect()[0]
    a = np.abs(v.astype(np.float64))
    assert out["n_samples"] == 256
    assert out["n_clipped"] == int((a >= 0.999).sum())
    assert out["n_silent"] == int((a <= 1.0 / 1024).sum())
    assert out["peak"] == pytest.approx(float(a.max()), rel=1e-12)
    assert out["rms"] == pytest.approx(
        float(np.sqrt(np.mean(a ** 2))), rel=1e-12)


def test_gate_quarantines_corrupt_clip(spark):
    df = spark.createDataFrame(
        [("bad", bytearray(b"not audio at all"))],
        "clip_id string, bytes binary",
    )
    r = quality_gate_audio(df).collect()[0]
    assert r["passes"] is False
    assert r["reject_reasons"] == "decode_error"
