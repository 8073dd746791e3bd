"""Thirtieth-batch operators: robust median/MAD outliers,
rolling-origin CV folds (+ the composed text_curation_v2 driver query
is covered by the oracle gate)."""

import datetime

from pyspark.sql import functions as F

from rp_extract_spark.operators.curation import (
    robust_outliers,
    rolling_origin_folds,
)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, v double")


# ------------------------------------------------- robust_outliers


def test_robust_outliers_flags_only_the_spike(spark):
    rows = [("a", i, 10.0 + (i % 3) * 0.1) for i in range(9)] + [
        ("a", 99, 1000.0)
    ]
    out = {r["id"]: r for r in robust_outliers(
        _vals(spark, rows), "g", "v", "id").collect()}
    assert out[99]["is_outlier"] == 1
    assert all(out[i]["is_outlier"] == 0 for i in range(9))


def test_robust_outliers_exact_median_even_and_odd(spark):
    # odd group: median of 1,2,3 = 2 -> med2 = 400 (2x micro-cents /100)
    out = {r["id"]: r for r in robust_outliers(
        _vals(spark, [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0)]),
        "g", "v", "id").collect()}
    assert out[1]["med2"] == 400  # 2 * 200 micro-cents
    # even group: central two of 1,2,3,4 -> med2 = 200+300 = 500
    out2 = {r["id"]: r for r in robust_outliers(
        _vals(spark, [("b", i, float(i)) for i in range(1, 5)]),
        "g", "v", "id").collect()}
    assert out2[1]["med2"] == 500


def test_robust_outliers_constant_group_flags_any_deviation(spark):
    rows = [("a", i, 5.0) for i in range(5)] + [("a", 9, 5.01)]
    out = {r["id"]: r for r in robust_outliers(
        _vals(spark, rows), "g", "v", "id").collect()}
    assert out[9]["mad2"] == 0
    assert out[9]["is_outlier"] == 1  # dev > 0 with MAD 0
    assert out[0]["is_outlier"] == 0


# ------------------------------------------------- rolling_origin_folds


def _ev(spark, ts_list):
    return spark.createDataFrame(
        [
            (i, datetime.datetime.utcfromtimestamp(t))
            for i, t in enumerate(ts_list)
        ],
        "event_id long, ts timestamp",
    )


def test_rolling_folds_monotone_in_time(spark):
    out = rolling_origin_folds(
        _ev(spark, [100 * i for i in range(16)]), n_folds=4
    ).orderBy("t").collect()
    folds = [r["fold"] for r in out]
    assert folds == sorted(folds)
    assert set(folds) == {0, 1, 2, 3}


def test_rolling_folds_edge_rows_fall_low(spark):
    # 5 rows, edges at ranks floor(p*4)+1 -> t values 200, 300, 400;
    # rows equal to an edge stay in the lower fold
    out = {r["event_id"]: r["fold"] for r in rolling_origin_folds(
        _ev(spark, [100, 200, 300, 400, 500]), n_folds=4).collect()}
    assert out[0] == 0 and out[1] == 0   # 200 == edge0 -> lower
    assert out[2] == 1 and out[3] == 2 and out[4] == 3


def test_rolling_folds_no_future_leakage_property(spark):
    # every row in fold f is >= every row in fold f-1 (forward chain)
    out = rolling_origin_folds(
        _ev(spark, [7 * i % 101 for i in range(40)]), n_folds=4
    ).collect()
    by_fold = {}
    for r in out:
        by_fold.setdefault(r["fold"], []).append(r["t"])
    folds = sorted(by_fold)
    for a, b in zip(folds, folds[1:]):
        assert max(by_fold[a]) <= min(by_fold[b])
