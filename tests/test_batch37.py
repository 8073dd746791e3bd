"""Thirty-seventh-batch operators: CUSUM changepoints, clustering
agreement (Rand index)."""

import datetime

from pyspark.sql import functions as F

from rp_extract_spark.operators.classify import clustering_agreement
from rp_extract_spark.operators.windows import cusum_changepoints


def _ev(spark, rows):
    return spark.createDataFrame(
        [(g, datetime.datetime.utcfromtimestamp(t)) for g, t in rows],
        "g string, ts timestamp",
    )


# ------------------------------------------------- cusum_changepoints


def test_cusum_closed_form_matches_recursion(spark):
    # counts per day: 2,2,2,10,10 for group a (shift at day 3)
    rows = []
    day = 86400
    for d, c in enumerate([2, 2, 2, 10, 10]):
        rows += [("a", d * day + i) for i in range(c)]
    out = {r["bucket"]: r for r in cusum_changepoints(
        _ev(spark, rows), group_col="g", threshold_num=1,
        threshold_den=1).collect()}
    # replay the recursion in python on the same integer grid
    g = 1_000_000
    xs = [2, 2, 2, 10, 10]
    mean_u = sum(xs) * g // len(xs)
    s = 0
    for d, x in enumerate(xs):
        s = max(0, s + (x * g - mean_u))
        assert out[d]["s"] == s, d
        assert out[d]["flagged"] == (1 if s * 1 > 1 * mean_u else 0)


def test_cusum_flat_series_never_flags(spark):
    rows = [("a", d * 86400 + i) for d in range(6) for i in range(5)]
    out = cusum_changepoints(_ev(spark, rows), group_col="g").collect()
    assert all(r["flagged"] == 0 for r in out)
    assert all(r["s"] == 0 for r in out)  # d == 0 everywhere


def test_cusum_groups_independent(spark):
    rows = [("a", d * 86400) for d in range(3)] + [
        ("b", d * 86400 + i) for d in range(3) for i in range([1, 1, 50][d])
    ]
    out = cusum_changepoints(
        _ev(spark, rows), group_col="g", threshold_num=1, threshold_den=1
    ).collect()
    a = [r for r in out if r["g"] == "a"]
    b = [r for r in out if r["g"] == "b"]
    assert all(r["flagged"] == 0 for r in a)
    # the day-2 spike (50 vs mean ~17.3) exceeds 1x the group mean
    assert any(r["flagged"] == 1 for r in b)


# ------------------------------------------------- clustering_agreement


def _lbl(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


def test_agreement_identical_clusterings(spark):
    rows = [("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")]
    r = clustering_agreement(_lbl(spark, rows), "a", "b").collect()[0]
    assert r["rand_u"] == 1_000_000


def test_agreement_exact_hand_computation(spark):
    # a: {1,2}{3}; b: {1}{2,3} -> agreements: only pair (1,3) and
    # (2,3)? recompute: pairs (1,2): same a, diff b -> disagree;
    # (1,3): diff a, diff b -> agree; (2,3): diff a, same b -> disagree
    rows = [("x", "p"), ("x", "q"), ("y", "q")]
    r = clustering_agreement(_lbl(spark, rows), "a", "b").collect()[0]
    assert r["t_pairs"] == 3
    assert r["s_ab"] == 0 and r["s_a"] == 1 and r["s_b"] == 1
    assert r["rand_u"] == (3 + 0 - 1 - 1) * 1_000_000 // 3


def test_agreement_null_labels_excluded(spark):
    rows = [("x", "p"), ("x", None), (None, "p"), ("x", "p")]
    r = clustering_agreement(_lbl(spark, rows), "a", "b").collect()[0]
    assert r["n"] == 2 and r["rand_u"] == 1_000_000
