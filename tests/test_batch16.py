"""Sixteenth-batch operators: int8 embedding quantization, duplicate-
cluster report, leakage-safe group folds."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.curation import group_folds
from rp_extract_spark.operators.dedup import cluster_size_report
from rp_extract_spark.operators.similarity import quantize_embeddings_int8


# --------------------------------------------- quantize_embeddings_int8


def test_int8_quantize_matches_python_replay(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 6))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = quantize_embeddings_int8(df).collect()
    g = 1_000_000
    xu = {}
    for i in range(20):
        for d in range(6):
            xu[(i, d)] = math.floor(vecs[i][d] * g + 0.5)
    amax = {d: max(abs(xu[(i, d)]) for i in range(20)) for d in range(6)}
    assert len(out) == 120
    for r in out:
        x = xu[(r.vec_id, r.dim)]
        a = amax[r.dim]
        sgn = 1 if x >= 0 else -1
        want_q = sgn * ((abs(x) * 127) // a) if a else 0
        assert r.x_u == x and r.amax_u == a and r.q == want_q
        deq = (1 if want_q >= 0 else -1) * ((abs(want_q) * a) // 127)
        assert r.err_u == abs(x - deq)
        assert -127 <= r.q <= 127


def test_int8_quantize_error_bound(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = quantize_embeddings_int8(df).collect()
    # quantization error is bounded by one code step (amax/127)
    for r in out:
        assert r.err_u <= r.amax_u // 127 + 1
    # the max-magnitude element of each dim quantizes to ±127
    by_dim = {}
    for r in out:
        by_dim.setdefault(r.dim, []).append(r)
    for rows_d in by_dim.values():
        assert max(abs(r.q) for r in rows_d) == 127


def test_int8_quantize_zero_dim(spark):
    rows = [(0, [0.0, 1.0]), (1, [0.0, -1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {(r.vec_id, r.dim): r for r in
           quantize_embeddings_int8(df).collect()}
    assert out[(0, 0)].q == 0 and out[(0, 0)].err_u == 0
    assert out[(0, 1)].q == 127 and out[(1, 1)].q == -127


# --------------------------------------------------- cluster_size_report


def test_cluster_report_histogram(spark):
    rows = [("a", "r1"), ("b", "r1"), ("c", "r1"),
            ("d", "r2"), ("e", "r2"),
            ("f", "r3"), ("g", "r4")]
    df = spark.createDataFrame(rows, "id string, rep_id string")
    got = {r.size: (r.n_clusters, r.n_rows, r.n_dup_rows)
           for r in cluster_size_report(df).collect()}
    assert got == {1: (2, 2, 0), 2: (1, 2, 1), 3: (1, 3, 2)}


def test_cluster_report_total_reconciles(spark):
    rows = [(f"x{i}", f"r{i % 5}") for i in range(23)]
    df = spark.createDataFrame(rows, "id string, rep_id string")
    rep = cluster_size_report(df).collect()
    assert sum(r.n_rows for r in rep) == 23
    assert sum(r.n_clusters for r in rep) == 5
    assert sum(r.n_dup_rows for r in rep) == 23 - 5


# --------------------------------------------------------- group_folds


def test_group_folds_same_group_same_fold(spark):
    rows = [(f"m{i}", f"g{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "id string, rep_id string")
    out = group_folds(df, "rep_id", k=3, seed=5).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.rep_id, set()).add(r.fold)
    assert all(len(fs) == 1 for fs in by_group.values())
    for g, fs in by_group.items():
        h = int(hashlib.md5(f"{g}:5".encode()).hexdigest()[:15], 16)
        assert fs == {h % 3}
    assert {r.fold for r in out} <= {0, 1, 2}


def test_group_folds_rejects_bad_k(spark):
    df = spark.createDataFrame([("a", "g")], "id string, rep_id string")
    with pytest.raises(ValueError):
        group_folds(df, "rep_id", k=0)
