"""Thirty-third-batch operators: text normalization, vocab pruning,
split-conformal calibration thresholds."""

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.classify import conformal_thresholds
from rp_extract_spark.operators.curation import prune_vocab
from rp_extract_spark.operators.text import normalize_text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------- normalize_text


def test_normalize_strips_control_and_collapses(spark):
    raw = "  a\x07b\t\tc  d \n\n\n\n e "
    r = normalize_text(_docs(spark, [(1, raw)])).collect()[0]
    assert r["text_norm"] == "ab c d\n\ne"
    assert r["n_ctrl"] == 1
    assert r["changed"] == 1


def test_normalize_keeps_tab_newline_semantics(spark):
    # tabs collapse to spaces; single newlines survive; paragraph
    # breaks cap at two
    r = normalize_text(_docs(spark, [(1, "a\tb\nc\n\nd")])).collect()[0]
    assert r["text_norm"] == "a b\nc\n\nd"
    assert r["changed"] == 1


def test_normalize_clean_text_unchanged(spark):
    r = normalize_text(_docs(spark, [(1, "already clean")])).collect()[0]
    assert r["text_norm"] == "already clean"
    assert r["changed"] == 0 and r["n_ctrl"] == 0


def test_normalize_null_passthrough(spark):
    r = normalize_text(_docs(spark, [(1, None)])).collect()[0]
    assert r["text_norm"] is None
    assert r["n_ctrl"] is None and r["changed"] == 0


# ------------------------------------------------- prune_vocab


def _counts(spark, pairs):
    return spark.createDataFrame(pairs, "token string, __cnt long")


def test_prune_vocab_dense_ids_and_cutoff(spark):
    out = prune_vocab(
        _counts(spark, [("a", 10), ("b", 10), ("c", 3), ("d", 7)]),
        min_count=5,
    ).collect()
    got = {r["token"]: r for r in out}
    assert "c" not in got
    # (count desc, token asc): a=0, b=1, d=2 — dense, gap-free
    assert got["a"]["token_id"] == 0
    assert got["b"]["token_id"] == 1
    assert got["d"]["token_id"] == 2


# ------------------------------------------------- conformal_thresholds


def _scores(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, s double")


def test_conformal_rank_formula(spark):
    # n=9, alpha=0.1: r = ceil(10*0.9) = 9 -> the maximum
    rows = [("a", i, float(i)) for i in range(9)]
    r = conformal_thresholds(
        _scores(spark, rows), "g", "s", "id"
    ).collect()[0]
    assert r["n"] == 9 and r["r"] == 9
    assert r["threshold_u"] == 800  # value 8.0 in micro-cents


def test_conformal_rank_clamped_to_n(spark):
    # n=3: ceil(4*0.9) = 4 > n -> clamp to 3
    rows = [("a", i, float(i)) for i in range(3)]
    r = conformal_thresholds(
        _scores(spark, rows), "g", "s", "id"
    ).collect()[0]
    assert r["r"] == 3 and r["threshold_u"] == 200


def test_conformal_coverage_property(spark):
    # empirical coverage >= 1 - alpha on the calibration set itself
    rows = [("a", i, float((i * 37) % 101)) for i in range(50)]
    thr = conformal_thresholds(
        _scores(spark, rows), "g", "s", "id", alpha_num=1, alpha_den=5
    ).collect()[0]["threshold_u"]
    vals = sorted(((i * 37) % 101) * 100 for i in range(50))
    covered = sum(1 for v in vals if v <= thr)
    assert covered / 50 >= 0.8


def test_conformal_rejects_bad_alpha(spark):
    with pytest.raises(ValueError):
        conformal_thresholds(
            _scores(spark, [("a", 1, 1.0)]), "g", "s", "id",
            alpha_num=5, alpha_den=5,
        )
