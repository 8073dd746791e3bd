"""Thirty-first-batch operators: exact nDCG@k, balanced class weights,
nested learning-curve sampling plan."""

import math

from pyspark.sql import functions as F

from rp_extract_spark.operators.classify import class_weights, ndcg_at_k
from rp_extract_spark.operators.curation import learning_curve_plan


# ------------------------------------------------- ndcg_at_k


def _rank_df(spark, rows):
    return spark.createDataFrame(rows, "g long, id long, score double, rel long")


def _w(i, grain=1_000_000):
    return int(math.floor(grain / math.log2(i + 1) + 0.5))


def test_ndcg_perfect_ranking_is_grain(spark):
    rows = [(1, i, 10.0 - i, 3 - i) for i in range(4)]  # score order == rel order
    r = ndcg_at_k(
        _rank_df(spark, rows), "g", "score", "rel", "id", k=10
    ).collect()[0]
    assert r["dcg_u"] == r["idcg_u"]
    assert r["ndcg_u"] == 1_000_000


def test_ndcg_exact_hand_computation(spark):
    # ranking by score: id0 (rel 0), id1 (rel 3) -> dcg = 0*w1 + 3*w2
    # ideal: 3*w1 + 0*w2
    rows = [(1, 0, 2.0, 0), (1, 1, 1.0, 3)]
    r = ndcg_at_k(
        _rank_df(spark, rows), "g", "score", "rel", "id", k=10
    ).collect()[0]
    assert r["dcg_u"] == 3 * _w(2)
    assert r["idcg_u"] == 3 * _w(1)
    assert r["ndcg_u"] == (3 * _w(2) * 1_000_000) // (3 * _w(1))


def test_ndcg_all_zero_relevance_is_zero(spark):
    rows = [(1, i, float(i), 0) for i in range(3)]
    r = ndcg_at_k(
        _rank_df(spark, rows), "g", "score", "rel", "id", k=10
    ).collect()[0]
    assert r["idcg_u"] == 0 and r["ndcg_u"] == 0


def test_ndcg_cutoff_at_k(spark):
    # relevant item ranked 3rd contributes nothing at k=2
    rows = [(1, 0, 3.0, 0), (1, 1, 2.0, 0), (1, 2, 1.0, 3)]
    r = ndcg_at_k(
        _rank_df(spark, rows), "g", "score", "rel", "id", k=2
    ).collect()[0]
    assert r["dcg_u"] == 0
    assert r["idcg_u"] == 3 * _w(1)


# ------------------------------------------------- class_weights


def test_class_weights_balanced_formula(spark):
    df = spark.createDataFrame(
        [(i, 0) for i in range(8)] + [(100 + i, 1) for i in range(2)],
        "id long, label int",
    )
    out = {r["label"]: r for r in class_weights(df).collect()}
    # n=10, k=2: w0 = 10*1e6 div (2*8), w1 = 10*1e6 div (2*2)
    assert out[0]["weight_u"] == 625_000
    assert out[1]["weight_u"] == 2_500_000


def test_class_weights_excludes_null_labels(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, None), (3, 0)], "id long, label int"
    )
    out = class_weights(df).collect()
    assert len(out) == 1
    assert out[0]["n_c"] == 2


# ------------------------------------------------- learning_curve_plan


def _docs(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_learning_curve_nested_subsets(spark):
    out = learning_curve_plan(_docs(spark, 2000)).collect()
    # subset at rate r = rows with min_rate <= r; nested by construction
    s10 = {r["doc_id"] for r in out if r["bucket"] <= 0}
    s25 = {r["doc_id"] for r in out if r["bucket"] <= 1}
    s50 = {r["doc_id"] for r in out if r["bucket"] <= 2}
    assert s10 <= s25 <= s50
    # rough sizes (md5 is uniform): 10% within [5%, 15%] etc.
    assert 100 <= len(s10) <= 300
    assert 350 <= len(s25) <= 650
    assert 800 <= len(s50) <= 1200


def test_learning_curve_matches_hash_sample(spark):
    from rp_extract_spark.operators.curation import hash_sample

    d = _docs(spark, 500)
    plan = learning_curve_plan(d)
    for rate, b in [(0.1, 0), (0.25, 1), (0.5, 2)]:
        sampled = {r["doc_id"] for r in hash_sample(d, rate).collect()}
        planned = {
            r["doc_id"] for r in plan.filter(F.col("bucket") <= b).collect()
        }
        assert sampled == planned


def test_learning_curve_rejects_unsorted_rates(spark):
    import pytest

    with pytest.raises(ValueError):
        learning_curve_plan(_docs(spark, 5), rates=(0.5, 0.25))
