"""Thirty-ninth-batch operators: image metadata audit, dedup
precision/recall vs ground truth."""

import numpy as np
from pyspark.sql import functions as F

from rp_extract_spark.codecs import encode_png
from rp_extract_spark.operators.classify import pair_prf
from rp_extract_spark.operators.images import audit_image_meta


def _imgs(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )


def test_meta_audit_flags_wrong_dims(spark):
    px = np.zeros((8, 16), dtype=np.uint8)
    rows = [
        ("ok", bytearray(encode_png(px)), "png", 16, 8),
        ("wrong_w", bytearray(encode_png(px)), "png", 20, 8),
        ("wrong_h", bytearray(encode_png(px)), "png", 16, 9),
        ("corrupt", bytearray(b"junk"), "png", 16, 8),
    ]
    out = {r["image_id"]: r for r in audit_image_meta(
        _imgs(spark, rows)).collect()}
    assert out["ok"]["meta_ok"] == 1
    assert out["wrong_w"]["meta_ok"] == 0
    assert out["wrong_w"]["real_w"] == 16  # decode recovers the truth
    assert out["wrong_h"]["meta_ok"] == 0
    assert out["corrupt"]["meta_ok"] is None
    assert out["corrupt"]["err"] is not None


def test_meta_audit_null_declared_dims(spark):
    px = np.zeros((4, 4), dtype=np.uint8)
    rows = [("nodim", bytearray(encode_png(px)), "png", None, None)]
    r = audit_image_meta(_imgs(spark, rows)).collect()[0]
    assert r["meta_ok"] == 0  # NULL declaration never equals reality
    assert r["real_w"] == 4


def _lbl(spark, rows):
    return spark.createDataFrame(rows, "pred string, truth string")


def test_pair_prf_perfect(spark):
    rows = [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")]
    r = pair_prf(_lbl(spark, rows), "pred", "truth").collect()[0]
    assert r["precision_u"] == 1_000_000
    assert r["recall_u"] == 1_000_000
    assert r["f1_u"] == 1_000_000


def test_pair_prf_hand_computed(spark):
    # pred merges everything; truth has two groups of 2:
    # TP = C(2,2)+C(2,2) = 2, pred_pairs = C(4,2) = 6, true_pairs = 2
    rows = [("a", "x"), ("a", "x"), ("a", "y"), ("a", "y")]
    r = pair_prf(_lbl(spark, rows), "pred", "truth").collect()[0]
    assert r["tp"] == 2 and r["pred_pairs"] == 6 and r["true_pairs"] == 2
    assert r["precision_u"] == 2 * 1_000_000 // 6
    assert r["recall_u"] == 1_000_000
    assert r["f1_u"] == 4 * 1_000_000 // 8


def test_pair_prf_no_pairs(spark):
    rows = [("a", "x"), ("b", "y")]  # singletons everywhere
    r = pair_prf(_lbl(spark, rows), "pred", "truth").collect()[0]
    assert r["tp"] == 0 and r["precision_u"] == 0 and r["f1_u"] == 0
