"""Thirty-eighth-batch operators: Matryoshka truncation recall,
multi-signal transitive dedup."""

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.dedup import multi_signal_dedup
from rp_extract_spark.operators.similarity import dim_truncation_recall


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ------------------------------------------------- dim_truncation_recall


def test_dim_trunc_full_overlap_when_prefix_carries_signal(spark):
    # vectors differ only in the first 2 dims -> truncation to 2 dims
    # ranks identically to the full ranking
    rows = [(i, [float(i), float(-i), 0.0, 0.0]) for i in range(6)]
    out = dim_truncation_recall(
        _vecs(spark, [rows[0]]), _vecs(spark, rows), trunc_dims=2, k=3
    ).collect()
    assert out[0]["n_overlap"] == 3


def test_dim_trunc_zero_overlap_when_signal_in_tail(spark):
    # query [1, 0, 0, 1]: full ranking is driven by dim 3 (matching
    # gallery vectors 1..3), truncated (dim 1) ranking by dim 0
    # (matching vectors 4..6) — disjoint top-1 sets
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),
        (1, [0.0, 0.0, 0.0, 5.0]),
        (2, [-9.0, 0.0, 0.0, 0.0]),
    ]
    out = dim_truncation_recall(
        _vecs(spark, [rows[0]]), _vecs(spark, rows), trunc_dims=1, k=1
    ).collect()
    # full top-1 = vec 1 (dot 5); truncated top-1 = vec 1? dot_t(1)=0,
    # dot_t(2)=-9 -> top-1 truncated IS vec 1 (0 > -9). overlap = 1
    assert out[0]["n_overlap"] == 1


def test_dim_trunc_excludes_self(spark):
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [0.5, 0.5])]
    out = dim_truncation_recall(
        _vecs(spark, [rows[0]]), _vecs(spark, rows), trunc_dims=1, k=2
    ).collect()
    # overlap counts gallery rows only; with self excluded both
    # rankings hold exactly {1, 2}
    assert out[0]["n_overlap"] == 2


# ------------------------------------------------- multi_signal_dedup


def _sig(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, u string, f string")


def test_multi_signal_chains_across_signals(spark):
    # 1-2 share a URL; 2-3 share a fingerprint -> {1,2,3} one group
    rows = [
        (1, "u1", "fA"),
        (2, "u1", "fB"),
        (3, "u9", "fB"),
        (4, "u4", "fC"),
    ]
    out = {r["doc_id"]: r["rep_id"] for r in multi_signal_dedup(
        _sig(spark, rows), signal_cols=("u", "f")).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4


def test_multi_signal_null_signal_contributes_no_edge(spark):
    rows = [(1, None, "fA"), (2, None, "fB")]
    out = {r["doc_id"]: r["rep_id"] for r in multi_signal_dedup(
        _sig(spark, rows), signal_cols=("u", "f")).collect()}
    # NULL URLs must not form a shared bucket
    assert out[1] == 1 and out[2] == 2


def test_multi_signal_value_collision_across_signals_safe(spark):
    # the same VALUE in different signal columns must not connect
    # (prefixing isolates signal namespaces)
    rows = [(1, "same", "x"), (2, "y", "same")]
    out = {r["doc_id"]: r["rep_id"] for r in multi_signal_dedup(
        _sig(spark, rows), signal_cols=("u", "f")).collect()}
    assert out[1] == 1 and out[2] == 2


def test_multi_signal_requires_signals(spark):
    with pytest.raises(ValueError):
        multi_signal_dedup(_sig(spark, [(1, "a", "b")]), signal_cols=())
