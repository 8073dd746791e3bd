"""Regression tests for the third-session review findings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.codecs.wav import encode_wav
from rp_extract_spark.operators.curation import (
    learning_curve_plan,
    validate_expectations,
)
from rp_extract_spark.operators.multimodal import fingerprint_audio


def test_fingerprint_audio_custom_id_col(spark):
    # finding 1: b[id_col] after the rename to clip_id crashed any
    # non-default id column
    x = np.random.default_rng(1).standard_normal(64).astype(np.float32)
    df = spark.createDataFrame(
        [("t1", bytearray(encode_wav(x, 8000, samplewidth=4)))],
        "track_id string, bytes binary",
    )
    out = fingerprint_audio(df, id_col="track_id").collect()
    assert out[0]["clip_id"] == "t1" and out[0]["err"] is None


def test_learning_curve_rejects_rate_over_one(spark):
    # finding 2: a mid-list rate >= 1.0 formats to 9 hex chars and
    # silently breaks nesting (the group_split defect class)
    d = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    with pytest.raises(ValueError, match=r"\(0, 1\]"):
        learning_curve_plan(d, rates=(0.5, 1.0, 2.0))
    with pytest.raises(ValueError, match=r"\(0, 1\]"):
        learning_curve_plan(d, rates=(0.5, 1.5))
    # a trailing 1.0 stays legal
    out = learning_curve_plan(d, rates=(0.5, 1.0)).collect()
    assert {r["bucket"] for r in out} <= {0, 1}


def test_expectations_duplicate_rule_names_rejected(spark):
    # finding 8: duplicate names silently aliased to the first counter
    d = spark.createDataFrame([(5,)], "n int")
    with pytest.raises(ValueError, match="unique"):
        validate_expectations(
            d, [("bound", "min", "n", 10), ("bound", "max", "n", 400)]
        )
