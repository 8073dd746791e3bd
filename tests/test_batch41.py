"""Forty-first-batch operator: golden-record survivorship."""

import pytest

from rp_extract_spark.operators.dedup import golden_record


def _data(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, score long")


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rep_id long")


def test_golden_record_per_attribute_rules(spark):
    rows = [
        (1, "short", 9),
        (2, "the longest text here", 3),
        (3, None, 7),
        (4, "solo", 1),
    ]
    labels = [(1, 1), (2, 1), (3, 1), (4, 4)]
    out = {r["rep_id"]: r for r in golden_record(
        _data(spark, rows), _labels(spark, labels),
        best_of={
            "first_id": ("doc_id", "min"),
            "best_text": ("text", "longest"),
            "top_score": ("score", "max"),
        },
    ).collect()}
    g = out[1]
    # attributes come from DIFFERENT members
    assert g["first_id"] == 1
    assert g["best_text"] == "the longest text here"  # member 2
    assert g["top_score"] == 9                        # member 1
    assert g["n_members"] == 3
    assert out[4]["best_text"] == "solo"


def test_golden_record_equal_length_tiebreak(spark):
    rows = [(1, "bbb", 0), (2, "aaa", 0)]
    out = golden_record(
        _data(spark, rows), _labels(spark, [(1, 1), (2, 1)]),
        best_of={"best_text": ("text", "longest")},
    ).collect()[0]
    # equal lengths: max (length, value) struct -> lexicographically
    # larger value wins, deterministically
    assert out["best_text"] == "bbb"


def test_golden_record_all_null_attribute(spark):
    rows = [(1, None, 5), (2, None, 6)]
    out = golden_record(
        _data(spark, rows), _labels(spark, [(1, 1), (2, 1)]),
        best_of={"best_text": ("text", "longest")},
    ).collect()[0]
    assert out["best_text"] is None


def test_golden_record_rejects_bad_rule(spark):
    with pytest.raises(ValueError, match="rule"):
        golden_record(
            _data(spark, [(1, "a", 1)]), _labels(spark, [(1, 1)]),
            best_of={"x": ("text", "median")},
        )
    with pytest.raises(ValueError, match="at least one"):
        golden_record(
            _data(spark, [(1, "a", 1)]), _labels(spark, [(1, 1)]),
            best_of={},
        )
