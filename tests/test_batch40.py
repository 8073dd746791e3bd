"""Fortieth-batch operators: pairwise series correlation on exact
integer moments, missing time-bucket gap detection."""

import datetime
import math

from pyspark.sql import functions as F

from rp_extract_spark.operators.windows import (
    missing_buckets,
    series_correlation,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(g, datetime.datetime.utcfromtimestamp(t)) for g, t in rows],
        "g string, ts timestamp",
    )


DAY = 86400


def test_series_corr_perfect_positive(spark):
    rows = []
    for d, c in enumerate([1, 2, 3]):
        rows += [("a", d * DAY)] * c + [("b", d * DAY)] * (2 * c)
    r = series_correlation(_ev(spark, rows), group_col="g").collect()[0]
    assert r["corr"] == 1.0
    assert r["n_buckets"] == 3


def test_series_corr_perfect_negative(spark):
    rows = []
    for d, (ca, cb) in enumerate([(1, 3), (2, 2), (3, 1)]):
        rows += [("a", d * DAY)] * ca + [("b", d * DAY)] * cb
    r = series_correlation(_ev(spark, rows), group_col="g").collect()[0]
    assert r["corr"] == -1.0


def test_series_corr_absent_bucket_counts_zero(spark):
    # group b has no events on day 1 -> its series is [5, 0], not [5]
    rows = [("a", 0)] * 2 + [("a", DAY)] * 2 + [("b", 0)] * 5
    r = series_correlation(_ev(spark, rows), group_col="g").collect()[0]
    # a = [2, 2] (zero variance) -> corr is NaN/None after divide
    assert r["sum_a"] == 4 and r["sum_b"] == 5
    assert r["n_buckets"] == 2
    assert r["corr"] is None or (isinstance(r["corr"], float)
                                 and math.isnan(r["corr"]))


def test_series_corr_hand_value(spark):
    xs, ys = [1, 2, 4], [1, 3, 2]
    rows = []
    for d in range(3):
        rows += [("a", d * DAY)] * xs[d] + [("b", d * DAY)] * ys[d]
    r = series_correlation(_ev(spark, rows), group_col="g").collect()[0]
    n = 3
    sa, sb = sum(xs), sum(ys)
    dot = sum(x * y for x, y in zip(xs, ys))
    qa, qb = sum(x * x for x in xs), sum(y * y for y in ys)
    want = round(
        (n * dot - sa * sb)
        / math.sqrt((n * qa - sa * sa) * (n * qb - sb * sb)),
        6,
    )
    assert r["corr"] == want


def test_missing_buckets_reports_gaps(spark):
    rows = [(1, 0), (1, 2 * DAY), (1, 5 * DAY), (2, 0), (2, DAY)]
    out = {(r["g"], r["bucket"]) for r in missing_buckets(
        _ev(spark, [(str(g), t) for g, t in rows]),
        entity_col="g").collect()}
    assert out == {("1", 1), ("1", 3), ("1", 4)}


def test_missing_buckets_dense_entity_empty(spark):
    rows = [("1", d * DAY) for d in range(4)]
    assert missing_buckets(_ev(spark, rows), entity_col="g").count() == 0
