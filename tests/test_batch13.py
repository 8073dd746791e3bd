"""Thirteenth-batch operators: exact AUC-ROC / average precision,
random erasing (cutout), pairwise image SSE, hard-negative mining."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.codecs import decode_image
from rp_extract_spark.operators.classify import auc_roc, average_precision
from rp_extract_spark.operators.images import (
    cutmix_geometry,
    image_pair_sse,
    random_erasing,
)
from rp_extract_spark.operators.similarity import hard_negatives
from rp_extract_spark.sources.images import formula_images_df


# ----------------------------------------------------------- auc_roc


def _auc_brute(pairs):
    """Reference AUC: P(score_pos > score_neg) + 0.5*P(tie)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num = 0.0
    for p in pos:
        for n in neg:
            if p > n:
                num += 1.0
            elif p == n:
                num += 0.5
    return num / (len(pos) * len(neg))


def test_auc_matches_brute_force(spark):
    pairs = [(10, 1), (9, 1), (8, 0), (7, 1), (6, 0), (5, 0), (4, 1),
             (3, 0), (2, 0), (1, 0)]
    df = spark.createDataFrame(pairs, "score_u long, label int")
    row = auc_roc(df, "score_u", "label").collect()[0]
    assert row["n"] == 10 and row["n_pos"] == 4 and row["n_neg"] == 6
    want = int(_auc_brute(pairs) * 1_000_000)
    assert row["auc_u"] == want


def test_auc_average_rank_ties(spark):
    # one tied score shared by a positive and a negative: the
    # average-rank convention counts it as half a win
    pairs = [(3, 1), (2, 1), (2, 0), (1, 0)]
    df = spark.createDataFrame(pairs, "score_u long, label int")
    row = auc_roc(df, "score_u", "label").collect()[0]
    brute = _auc_brute(pairs)  # (2 + 1 + 0.5 + 1) / 4 = wrong by hand:
    # pos=3: beats both negs (2). pos=2: ties neg 2 (0.5), beats 1 (1).
    assert brute == pytest.approx(3.5 / 4)
    assert row["auc_u"] == int(brute * 1_000_000)


def test_auc_degenerate_single_class(spark):
    df = spark.createDataFrame([(5, 1), (4, 1)], "score_u long, label int")
    row = auc_roc(df, "score_u", "label").collect()[0]
    assert row["n_neg"] == 0 and row["auc_u"] is None


def test_auc_perfect_and_inverted(spark):
    perfect = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], "score_u long, label int")
    assert auc_roc(perfect, "score_u", "label").collect()[0][
        "auc_u"] == 1_000_000
    inverted = spark.createDataFrame(
        [(10, 0), (9, 0), (2, 1), (1, 1)], "score_u long, label int")
    assert auc_roc(inverted, "score_u", "label").collect()[0]["auc_u"] == 0


# ------------------------------------------------- average_precision


def _ap_brute(rows, grain=1_000_000):
    """Reference AP with the operator's term-level floor grain."""
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    cp = 0
    total = 0
    npos = 0
    for rank, (_i, _s, y) in enumerate(ordered, start=1):
        cp += y
        if y == 1:
            total += (cp * grain) // rank
            npos += 1
    return total // npos if npos else None


def test_average_precision_matches_brute(spark):
    rows = [("a", 10, 1), ("b", 9, 0), ("c", 8, 1), ("d", 7, 0),
            ("e", 6, 1), ("f", 5, 0), ("g", 4, 0), ("h", 3, 1)]
    df = spark.createDataFrame(rows, "doc_id string, score_u long, label int")
    got = average_precision(df, "score_u", "label", "doc_id").collect()[0]
    assert got["n"] == 8 and got["n_pos"] == 4
    assert got["ap_u"] == _ap_brute(rows)


def test_average_precision_tie_id_order(spark):
    # equal scores: id ASC decides the rank — 'a' (positive) sorts
    # before 'b' (negative), so precision@1 is 1
    rows = [("a", 5, 1), ("b", 5, 0)]
    df = spark.createDataFrame(rows, "doc_id string, score_u long, label int")
    got = average_precision(df, "score_u", "label", "doc_id").collect()[0]
    assert got["ap_u"] == 1_000_000
    rows2 = [("a", 5, 0), ("b", 5, 1)]
    df2 = spark.createDataFrame(
        rows2, "doc_id string, score_u long, label int")
    got2 = average_precision(df2, "score_u", "label", "doc_id").collect()[0]
    assert got2["ap_u"] == 500_000


def test_average_precision_empty_positive(spark):
    df = spark.createDataFrame(
        [("a", 1, 0)], "doc_id string, score_u long, label int")
    got = average_precision(df, "score_u", "label", "doc_id").collect()[0]
    assert got["n_pos"] == 0 and got["ap_u"] is None


# ------------------------------------------------------ random_erasing


def test_random_erasing_pixels(spark):
    imgs = formula_images_df(spark, 6)
    src = {r.image_id: (bytes(r.bytes), r.fmt)
           for r in imgs.select("image_id", "bytes", "fmt").collect()}
    out = random_erasing(imgs, seed=5, epoch=2).collect()
    assert len(out) == 6
    for r in out:
        assert r.err is None
        base = decode_image(*src[r.image_id]).astype(np.int64)
        h, w = base.shape
        k = hashlib.md5(f"{r.image_id}:5:2:re".encode()).hexdigest()
        d = tuple(int(c, 16) for c in k[:4])
        x0, y0, ew, eh = cutmix_geometry(w, h, d)
        assert (r.x0, r.y0, r.erase_w, r.erase_h) == (x0, y0, ew, eh)
        got = decode_image(bytes(r.bytes), r.fmt).astype(np.int64)
        want = base.copy()
        want[y0:y0 + eh, x0:x0 + ew] = 128
        assert np.array_equal(got, want)
        # the erased window is inside the canvas and non-trivial
        assert 0 <= x0 and x0 + ew <= w and 0 <= y0 and y0 + eh <= h
        assert ew >= w // 4 and eh >= h // 4


def test_random_erasing_epoch_decorrelates(spark):
    imgs = formula_images_df(spark, 4)
    a = {r.image_id: (r.x0, r.y0, r.erase_w, r.erase_h)
         for r in random_erasing(imgs, seed=1, epoch=0).collect()}
    b = {r.image_id: (r.x0, r.y0, r.erase_w, r.erase_h)
         for r in random_erasing(imgs, seed=1, epoch=1).collect()}
    assert any(a[i] != b[i] for i in a)


def test_random_erasing_rejects_bad_fill(spark):
    imgs = formula_images_df(spark, 1)
    with pytest.raises(ValueError):
        random_erasing(imgs, fill=256)


def test_random_erasing_quarantines_corrupt(spark):
    imgs = formula_images_df(spark, 2).withColumn(
        "bytes",
        F.when(F.col("image_id") == "img00000000",
               F.lit(b"notapng")).otherwise(F.col("bytes")),
    )
    out = {r.image_id: r for r in random_erasing(imgs).collect()}
    assert out["img00000000"].err is not None
    assert out["img00000001"].err is None


# ------------------------------------------------------ image_pair_sse


def test_pair_sse_identity_is_zero(spark):
    imgs = formula_images_df(spark, 4)
    out = image_pair_sse(imgs, imgs).collect()
    assert len(out) == 4
    for r in out:
        assert r.err is None and r.sse == 0 and r.mse_u == 0
        assert r.n_px == r.w * r.h


def test_pair_sse_known_perturbation(spark):
    imgs = formula_images_df(spark, 3)
    erased = random_erasing(imgs, seed=5, epoch=2)
    out = {r.image_id: r for r in image_pair_sse(imgs, erased).collect()}
    src = {r.image_id: (bytes(r.bytes), r.fmt)
           for r in imgs.select("image_id", "bytes", "fmt").collect()}
    for iid, r in out.items():
        base = decode_image(*src[iid]).astype(np.int64)
        h, w = base.shape
        k = hashlib.md5(f"{iid}:5:2:re".encode()).hexdigest()
        x0, y0, ew, eh = cutmix_geometry(
            w, h, tuple(int(c, 16) for c in k[:4]))
        window = base[y0:y0 + eh, x0:x0 + ew]
        want = int(((window - 128) ** 2).sum())
        assert r.sse == want
        assert r.mse_u == (want * 1_000_000) // (w * h)


def test_pair_sse_shape_mismatch_is_err_row(spark):
    # image 0 (64x48) vs image 4 (64x64) relabeled to the same id
    a = formula_images_df(spark, 1)
    b = (
        formula_images_df(spark, 5)
        .filter(F.col("image_id") == "img00000004")
        .withColumn("image_id", F.lit("img00000000"))
    )
    out = image_pair_sse(a, b).collect()
    assert len(out) == 1 and out[0].err is not None


# ------------------------------------------------------ hard_negatives


def test_hard_negatives_brute_force(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, i % 4, [float(x) for x in vecs[i]]) for i in range(40)]
    e = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "label", "embedding")
    got = hard_negatives(q, e, query_id="q_id", corpus_id="vec_id",
                         k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    for qi in range(3):
        cands = sorted(
            (
                (-float(vecs[j] @ vecs[qi]), j)
                for j in range(40)
                if j % 4 != qi % 4 and j != qi
            ),
        )[:4]
        want = [j for _, j in cands]
        rs = sorted(by_q[qi], key=lambda r: r.rank)
        assert [r.vec_id for r in rs] == want
        # every mined negative has a different label and is not self
        assert all(r.neg_label != qi % 4 and r.vec_id != qi for r in rs)


def test_hard_negatives_excludes_same_label_entirely(spark):
    rows = [(i, 0 if i < 5 else 1,
             [float(i), 1.0]) for i in range(10)]
    e = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), "label", "embedding")
    got = hard_negatives(q, e, query_id="q_id", corpus_id="vec_id", k=20)
    assert all(r.neg_label == 1 for r in got.collect())


def test_hard_negatives_zero_norm_rows_excluded(spark):
    # a zero embedding (padding/failed-encode row) must not crash the
    # ANSI-mode cosine division; it is excluded from both sides
    rows = [(0, 0, [1.0, 0.0]), (1, 1, [0.0, 1.0]),
            (2, 1, [0.0, 0.0]), (3, 0, [0.7, 0.7])]
    e = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), "label", "embedding")
    got = hard_negatives(q, e, query_id="q_id", corpus_id="vec_id",
                         k=5).collect()
    assert [r.vec_id for r in got] == [1]  # zero-norm row 2 excluded


def test_pair_sse_one_sided_rows_become_err(spark):
    a = formula_images_df(spark, 3)
    b = formula_images_df(spark, 2)  # img00000002 missing in b
    out = {r.image_id: r for r in image_pair_sse(a, b).collect()}
    assert len(out) == 3
    assert out["img00000002"].err == "ValueError: missing in b"
    assert out["img00000000"].err is None
    # and the reverse direction reports the other side
    rev = {r.image_id: r for r in image_pair_sse(b, a).collect()}
    assert rev["img00000002"].err == "ValueError: missing in a"
