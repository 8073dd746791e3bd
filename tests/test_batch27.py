"""Twenty-seventh-batch operators: time-series gap-fill with exact
linear interpolation, per-group winsorization at disc quantiles,
best-of-burst sharpness selection."""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.codecs import encode_png
from rp_extract_spark.operators.curation import winsorize
from rp_extract_spark.operators.images import best_of_burst
from rp_extract_spark.operators.windows import gap_fill


# ------------------------------------------------- gap_fill


def _events(spark, rows):
    return spark.createDataFrame(
        [(e, datetime.datetime.utcfromtimestamp(t), v) for e, t, v in rows],
        "user_id long, ts timestamp, value double",
    )


def test_gap_fill_linear_interpolation_exact(spark):
    # obs at t=0 (v=1.00) and t=100 (v=3.00); grid step 50
    out = gap_fill(
        _events(spark, [(1, 0, 1.0), (1, 100, 3.0)]), step_s=50
    ).collect()
    got = {r["grid_ts"]: r["value_u"] for r in out}
    assert got == {0: 100, 50: 200, 100: 300}


def test_gap_fill_negative_slope_sign_split(spark):
    # v falls 3.00 -> 1.00 over 3 steps: -200 micro over 90 s;
    # at g=30: 300 + sign(-200)*((200*30) div 90) = 300 - 66 = 234
    out = gap_fill(
        _events(spark, [(1, 0, 3.0), (1, 90, 1.0)]), step_s=30
    ).collect()
    got = {r["grid_ts"]: r["value_u"] for r in out}
    assert got[0] == 300 and got[90] == 100
    assert got[30] == 300 - (200 * 30) // 90
    assert got[60] == 300 - (200 * 60) // 90


def test_gap_fill_exact_hit_and_bounds(spark):
    rows = [(1, 0, 1.0), (1, 50, 9.0), (1, 100, 2.0)]
    out = gap_fill(_events(spark, rows), step_s=50).collect()
    got = {r["grid_ts"]: r for r in out}
    # grid points all coincide with observations -> returned unchanged
    assert got[50]["value_u"] == 900
    assert got[50]["prev_ts"] == 50 and got[50]["next_ts"] == 50
    # grid spans exactly [min, max]
    assert sorted(got) == [0, 50, 100]


def test_gap_fill_duplicate_second_takes_max(spark):
    out = gap_fill(
        _events(spark, [(1, 0, 1.0), (1, 0, 5.0), (1, 60, 5.0)]), step_s=60
    ).collect()
    got = {r["grid_ts"]: r["value_u"] for r in out}
    assert got[0] == 500


def test_gap_fill_single_observation_entity(spark):
    out = gap_fill(_events(spark, [(7, 1000, 2.5)]), step_s=60).collect()
    assert len(out) == 1
    assert out[0]["grid_ts"] == 1000 and out[0]["value_u"] == 250


def test_gap_fill_one_exchange(spark):
    import io
    from contextlib import redirect_stdout

    df = gap_fill(_events(spark, [(1, 0, 1.0), (1, 100, 3.0)]), step_s=50)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # both window passes cluster on the entity key: hash exchanges on
    # __e only (obs agg + union window), never a range/global sort
    assert plan.count("Exchange rangepartitioning") == 0


# ------------------------------------------------- winsorize


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, v double")


def test_winsorize_exact_disc_quantiles(spark):
    # n=21 values 0..20: lo rank = 20*5//100+1 = 2 -> value 1;
    # hi rank = 20*95//100+1 = 20 -> value 19
    rows = [("a", i, float(i)) for i in range(21)]
    out = winsorize(
        _vals(spark, rows), group_col="g", value_col="v", id_col="id"
    ).collect()
    got = {r["id"]: r for r in out}
    assert got[0]["lo_u"] == 100 and got[0]["hi_u"] == 1900
    assert got[0]["clipped_u"] == 100      # below lo -> clipped up
    assert got[20]["clipped_u"] == 1900    # above hi -> clipped down
    assert got[10]["clipped_u"] == 1000    # interior untouched


def test_winsorize_null_and_group_isolation(spark):
    rows = [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, None), ("b", 4, 50.0)]
    out = winsorize(
        _vals(spark, rows), group_col="g", value_col="v", id_col="id"
    ).collect()
    ids = {r["id"] for r in out}
    assert 3 not in ids  # NULL value dropped
    got = {r["id"]: r for r in out}
    # group b has one row: its own value is both bounds
    assert got[4]["lo_u"] == got[4]["hi_u"] == 5000
    assert got[4]["clipped_u"] == 5000


def test_winsorize_tiebreak_deterministic(spark):
    # all-equal values: bounds are that value whatever the id order
    rows = [("a", i, 7.0) for i in range(10)]
    out = winsorize(
        _vals(spark, rows), group_col="g", value_col="v", id_col="id"
    ).collect()
    assert all(r["clipped_u"] == 700 for r in out)


# ------------------------------------------------- best_of_burst


def _burst(spark, rows):
    return spark.createDataFrame(
        rows, "burst_id string, image_id string, bytes binary, fmt string"
    )


def test_best_of_burst_picks_sharpest(spark):
    rng = np.random.default_rng(3)
    flat = np.full((16, 16), 100, dtype=np.uint8)       # lap == 0
    sharp = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    rows = [
        ("b0", "i0", bytearray(encode_png(flat)), "png"),
        ("b0", "i1", bytearray(encode_png(sharp)), "png"),
        ("b1", "i2", bytearray(encode_png(flat)), "png"),
    ]
    out = {r["burst_id"]: r for r in best_of_burst(_burst(spark, rows)).collect()}
    assert out["b0"]["image_id"] == "i1"
    assert out["b0"]["n_candidates"] == 2
    assert out["b1"]["image_id"] == "i2"
    assert out["b1"]["lap_sq_sum"] == 0


def test_best_of_burst_tie_takes_min_id(spark):
    flat = np.full((16, 16), 100, dtype=np.uint8)
    rows = [
        ("b0", "z9", bytearray(encode_png(flat)), "png"),
        ("b0", "a1", bytearray(encode_png(flat)), "png"),
    ]
    out = best_of_burst(_burst(spark, rows)).collect()
    assert out[0]["image_id"] == "a1"


def test_best_of_burst_quarantines_corrupt(spark):
    flat = np.full((16, 16), 100, dtype=np.uint8)
    rows = [
        ("b0", "good", bytearray(encode_png(flat)), "png"),
        ("b0", "bad", bytearray(b"not a png"), "png"),
    ]
    out = best_of_burst(_burst(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["image_id"] == "good"
    assert out[0]["n_candidates"] == 1  # corrupt row never counted
