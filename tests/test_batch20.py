"""Twentieth-batch operators: signed random projection, cohort
retention matrix."""

import hashlib
import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from rp_extract_spark.operators.similarity import random_projection
from rp_extract_spark.operators.windows import cohort_retention

BASE = datetime(2024, 1, 1)
WEEK = 604_800


# ----------------------------------------------------- random_projection


def test_random_projection_matches_python(spark):
    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(15, 10))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(15)],
        "vec_id long, embedding array<double>")
    got = {(r.vec_id, r.j): r.y_u
           for r in random_projection(df, in_dim=10, out_dim=4,
                                      seed=2).collect()}
    g = 1_000_000
    for i in range(15):
        xu = [math.floor(float(x) * g + 0.5) for x in vecs[i]]
        for j in range(4):
            want = sum(
                (1 if int(hashlib.md5(f"{d}:{j}:2".encode())
                          .hexdigest()[0], 16) % 2 == 0 else -1) * xu[d]
                for d in range(10)
            )
            assert got[(i, j)] == want


def test_random_projection_preserves_distance_roughly(spark):
    # JL property smoke: projected distances correlate with input
    # distances across pairs (signs fixed, exact arithmetic)
    rng = np.random.default_rng(1)
    # scale rows very differently: equal-scale gaussians concentrate
    # to near-identical pairwise distances, leaving nothing to
    # correlate against
    vecs = rng.normal(size=(12, 32)) * (1 + np.arange(12)[:, None])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(12)],
        "vec_id long, embedding array<double>")
    rows = random_projection(df, in_dim=32, out_dim=16, seed=0).collect()
    proj = {}
    for r in rows:
        proj.setdefault(r.vec_id, {})[r.j] = r.y_u
    ins, outs = [], []
    for a in range(12):
        for b in range(a):
            ins.append(float(np.sum((vecs[a] - vecs[b]) ** 2)))
            outs.append(sum((proj[a][j] - proj[b][j]) ** 2
                            for j in range(16)))
    corr = np.corrcoef(ins, outs)[0, 1]
    assert corr > 0.5


def test_random_projection_rejects_bad_dims(spark):
    df = spark.createDataFrame(
        [(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        random_projection(df, out_dim=0)


# ------------------------------------------------------ cohort_retention


def test_cohort_retention_matrix(spark):
    def ev(u, week, extra_s=0):
        return (u, BASE + timedelta(seconds=week * WEEK + extra_s + 1))

    rows = [
        # cohort A (week of BASE): u1 active w0, w1, w2; u2 active w0, w2
        ev("u1", 0), ev("u1", 1), ev("u1", 2),
        ev("u2", 0), ev("u2", 2), ev("u2", 2, 30),  # dup within week
        # cohort B (week 1): u3 active w1 only
        ev("u3", 1),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {(r.cohort, r.offset): (r.n_users, r.cohort_size,
                                  r.retention_u)
           for r in cohort_retention(df).collect()}
    base_week = (int(BASE.timestamp()) + 1) // WEEK
    # note: BASE+1s epoch // WEEK — all fixture events land in-week
    ca, cb = base_week, base_week + 1
    assert got[(ca, 0)] == (2, 2, 1_000_000)
    assert got[(ca, 1)] == (1, 2, 500_000)
    assert got[(ca, 2)] == (2, 2, 1_000_000)
    assert got[(cb, 0)] == (1, 1, 1_000_000)
    assert len(got) == 4


def test_cohort_retention_null_rows_excluded(spark):
    rows = [("u1", BASE), (None, BASE), ("u2", None)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = cohort_retention(df).collect()
    assert len(out) == 1 and out[0].n_users == 1
    with pytest.raises(ValueError):
        cohort_retention(df, period_seconds=0)


# ------------------------------------------------------ wordpiece_apply


def test_wordpiece_greedy_and_unk(spark):
    from rp_extract_spark.operators.curation import wordpiece_apply

    vocab = (list("abcdefghijklmnopqrstuv") + ["w"]
             + ["##" + c for c in "abcdefghijklmnopqrstuvy" ]
             + ["th", "##ble", "##er"])
    df = spark.createDataFrame(
        [(1, "table the row")], "doc_id long, text string")
    out = sorted(
        wordpiece_apply(df, vocab).collect(),
        key=lambda r: (r.wpos, r.pos),
    )
    got = [(r.wpos, r.pos, r.piece) for r in out]
    # 'row' reaches r, ##o, then 'w' has no continuation piece ->
    # the WHOLE word becomes [UNK] (never a partial emission)
    assert got == [
        (0, 0, "t"), (0, 1, "##a"), (0, 2, "##ble"),
        (1, 0, "th"), (1, 1, "##e"),
        (2, 0, "[UNK]"),
    ]


def test_wordpiece_longest_match_first(spark):
    from rp_extract_spark.operators.curation import wordpiece_apply

    # both 'a' and 'ab' initial; 'abc' must take 'ab' then '##c'
    vocab = ["a", "ab", "##b", "##c"]
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    got = [r.piece for r in wordpiece_apply(df, vocab)
           .orderBy("pos").collect()]
    assert got == ["ab", "##c"]


def test_wordpiece_validates_vocab(spark):
    from rp_extract_spark.operators.curation import wordpiece_apply

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pt
    with _pt.raises(ValueError):
        wordpiece_apply(df, [])
    with _pt.raises(ValueError):
        wordpiece_apply(df, ["a", "##"])
