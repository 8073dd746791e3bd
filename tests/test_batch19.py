"""Nineteenth-batch operators: JSON field extraction, embedding
drift, near-dup hash lookup."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.dedup import hamming64_lookup
from rp_extract_spark.operators.similarity import embedding_drift
from rp_extract_spark.sources.jsoncol import extract_json_fields


# -------------------------------------------------- extract_json_fields


def test_extract_json_typed_fields(spark):
    rows = [
        (1, '{"k": 42, "name": "x", "f": 1.5}'),
        (2, '{"k": "7"}'),          # numeric string still casts
        (3, '{"name": "y"}'),       # k absent -> NULL
        (4, 'not json at all'),     # malformed -> NULL
        (5, '{"k": "abc"}'),        # mistyped -> NULL
        (6, None),                  # NULL payload -> NULL
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    out = {r.id: (r.k, r.name)
           for r in extract_json_fields(
               df, "props", {"k": "long", "name": "string"}).collect()}
    assert out == {1: (42, "x"), 2: (7, None), 3: (None, "y"),
                   4: (None, None), 5: (None, None), 6: (None, None)}


def test_extract_json_rejects_empty_fields(spark):
    df = spark.createDataFrame([(1, "{}")], "id long, props string")
    with pytest.raises(ValueError):
        extract_json_fields(df, "props", {})


def test_extract_json_stays_jvm_side(spark):
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame([(1, '{"k": 1}')], "id long, props string")
    out = extract_json_fields(df, "props", {"k": "long"})
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


# ------------------------------------------------------ embedding_drift


def test_embedding_drift_exact_replay(spark):
    rng = np.random.default_rng(9)
    va = rng.normal(size=(30, 4))
    vb = rng.normal(size=(20, 4)) + 0.25  # shifted snapshot
    a = spark.createDataFrame(
        [(i, [float(x) for x in va[i]]) for i in range(30)],
        "vec_id long, embedding array<double>")
    b = spark.createDataFrame(
        [(i, [float(x) for x in vb[i]]) for i in range(20)],
        "vec_id long, embedding array<double>")
    got = {r.dim: r for r in embedding_drift(a, b).collect()}
    g = 1_000_000
    for d in range(4):
        sa = sum(math.floor(float(x) * g + 0.5) for x in va[:, d])
        sb = sum(math.floor(float(x) * g + 0.5) for x in vb[:, d])

        def mean_u(s, n):
            sgn = 1 if s >= 0 else -1
            return sgn * (abs(s) // n)

        r = got[d]
        assert (r.n_a, r.n_b) == (30, 20)
        assert (r.sum_a, r.sum_b) == (sa, sb)
        assert r.mean_a_u == mean_u(sa, 30)
        assert r.mean_b_u == mean_u(sb, 20)
        assert r.drift_u == abs(mean_u(sa, 30) - mean_u(sb, 20))
    # the +0.25 shift is visible on average (per-dim sample-mean noise
    # at n=30/20 is ~0.2, so individual dims can stray)
    avg = sum(got[d].drift_u for d in range(4)) / 4
    assert 100_000 < avg < 500_000


def test_embedding_drift_identical_snapshots_zero(spark):
    df = spark.createDataFrame(
        [(i, [0.1 * i, -0.2 * i]) for i in range(10)],
        "vec_id long, embedding array<double>")
    assert all(r.drift_u == 0
               for r in embedding_drift(df, df).collect())


# ----------------------------------------------------- hamming64_lookup


def test_hamming64_lookup_brute_force(spark):
    import itertools

    rng = np.random.default_rng(4)
    hashes = [int(rng.integers(-2**62, 2**62)) for _ in range(20)]
    # plant near-dups of hash 0 at distance 1 and 2
    hashes[5] = hashes[0] ^ 1
    hashes[9] = hashes[0] ^ (1 << 17) ^ (1 << 50)
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "id long, h long")
    q = df.filter(F.col("id") == 0)
    got = {(r.q_id, r.match_id, r.dist)
           for r in hamming64_lookup(q, df, "h", "id",
                                     max_hamming=2).collect()}
    want = set()
    for j in range(1, 20):
        dist = bin((hashes[0] ^ hashes[j]) & (2**64 - 1)).count("1")
        if dist <= 2:
            want.add((0, j, dist))
    assert got == want
    assert (0, 5, 1) in got and (0, 9, 2) in got


def test_hamming64_lookup_excludes_self_and_validates(spark):
    df = spark.createDataFrame([(1, 7), (2, 7)], "id long, h long")
    got = hamming64_lookup(df, df, "h", "id", max_hamming=1).collect()
    pairs = {(r.q_id, r.match_id) for r in got}
    assert pairs == {(1, 2), (2, 1)}
    assert all(r.dist == 0 for r in got)
    with pytest.raises(ValueError):
        hamming64_lookup(df, df, "h", "id", max_hamming=4)
