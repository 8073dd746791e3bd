"""Twenty-eighth-batch operators: audio fingerprint near-dup dedup,
first/last-touch conversion attribution."""

import datetime

import numpy as np
from pyspark.sql import functions as F

from rp_extract_spark.codecs.wav import encode_wav
from rp_extract_spark.operators.multimodal import (
    audio_dedup,
    audio_fingerprint64,
    fingerprint_audio,
)
from rp_extract_spark.operators.windows import attribute_conversions


# ------------------------------------------------- audio fingerprint


def test_fingerprint_deterministic_and_signed():
    rng = np.random.default_rng(11)
    x = rng.standard_normal(64).astype(np.float32)
    a = audio_fingerprint64(x)
    assert a == audio_fingerprint64(x)
    assert -(1 << 63) <= a < (1 << 63)


def test_fingerprint_local_perturbation_flips_at_most_two_bits():
    rng = np.random.default_rng(5)
    for trial in range(20):
        x = rng.standard_normal(64).astype(np.float64)
        k = int(rng.integers(0, 64))
        y = x.copy()
        y[k] *= 2.0
        d = audio_fingerprint64(x) ^ audio_fingerprint64(y)
        assert bin(d & ((1 << 64) - 1)).count("1") <= 2


def test_fingerprint_band_aggregation_long_clip():
    # 128 samples -> 2-sample bands; constant signal -> all equal
    # energies -> every strict compare false -> fp == 0
    x = np.full(128, 0.25)
    assert audio_fingerprint64(x) == 0


def _clips(spark, rows):
    return spark.createDataFrame(rows, "clip_id string, bytes binary")


def test_audio_dedup_groups_pairs_and_quarantines(spark):
    rng = np.random.default_rng(9)
    base_a = rng.standard_normal(64).astype(np.float32)
    base_b = rng.standard_normal(64).astype(np.float32) + np.float32(3.0)
    near_a = base_a.copy()
    near_a[7] *= np.float32(2.0)
    rows = [
        ("a0", bytearray(encode_wav(base_a, 8000, samplewidth=4))),
        ("a1", bytearray(encode_wav(near_a, 8000, samplewidth=4))),
        ("b0", bytearray(encode_wav(base_b, 8000, samplewidth=4))),
        ("bad", bytearray(b"not audio")),
    ]
    out = {r["clip_id"]: r for r in audio_dedup(_clips(spark, rows)).collect()}
    assert "bad" not in out  # decode failure quarantined
    assert out["a0"]["rep_id"] == out["a1"]["rep_id"] == "a0"
    assert out["b0"]["rep_id"] == "b0"


def test_fingerprint_audio_error_isolation(spark):
    rows = [("x", bytearray(b"junk"))]
    r = fingerprint_audio(_clips(spark, rows)).collect()[0]
    assert r["fp"] is None and r["err"] is not None


# ------------------------------------------------- attribution


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (u, datetime.datetime.utcfromtimestamp(t), i, ty)
            for u, t, i, ty in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )


def test_attribution_first_and_last_touch(spark):
    rows = [
        (1, 100, 1, "click"),
        (1, 200, 2, "view"),
        (1, 300, 3, "purchase"),
        (1, 400, 4, "click"),       # after conversion: ignored
    ]
    out = attribute_conversions(_ev(spark, rows), window_s=1000).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_touches"] == 2
    assert r["first_touch_id"] == 1 and r["first_touch_ts"] == 100
    assert r["last_touch_id"] == 2 and r["last_touch_ts"] == 200


def test_attribution_window_excludes_old_touches(spark):
    rows = [
        (1, 0, 1, "click"),          # outside the 100 s window
        (1, 150, 2, "view"),
        (1, 200, 3, "purchase"),
    ]
    r = attribute_conversions(_ev(spark, rows), window_s=100).collect()[0]
    assert r["n_touches"] == 1
    assert r["first_touch_id"] == 2 and r["last_touch_id"] == 2


def test_attribution_no_touch_is_null(spark):
    rows = [(1, 100, 1, "purchase"), (1, 50, 2, "error")]
    r = attribute_conversions(_ev(spark, rows)).collect()[0]
    assert r["n_touches"] == 0
    assert r["first_touch_id"] is None and r["last_touch_ts"] is None


def test_attribution_same_second_touch_counts(spark):
    rows = [(1, 100, 1, "click"), (1, 100, 2, "purchase")]
    r = attribute_conversions(_ev(spark, rows)).collect()[0]
    assert r["n_touches"] == 1 and r["first_touch_id"] == 1


def test_attribution_multiple_conversions_independent(spark):
    rows = [
        (1, 100, 1, "click"),
        (1, 200, 2, "purchase"),
        (1, 300, 3, "view"),
        (1, 400, 4, "purchase"),
    ]
    out = {r["conv_id"]: r for r in attribute_conversions(
        _ev(spark, rows), window_s=250).collect()}
    assert out[2]["n_touches"] == 1 and out[2]["last_touch_id"] == 1
    # click@100 is outside conv@400's [150, 400] window
    assert out[4]["n_touches"] == 1
    assert out[4]["first_touch_id"] == 3 and out[4]["last_touch_id"] == 3
