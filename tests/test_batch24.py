"""Twenty-fourth-batch operators: MMR diverse selection, rate-limit
replay, shuffle-quality audit."""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.similarity import mmr_select
from rp_extract_spark.operators.windows import (
    rate_limit_plan,
    shard_shuffle_audit,
)

BASE = datetime(2024, 1, 1)


# ------------------------------------------------------------ mmr_select


def _mmr_brute(vecs, rels, k, grain=1_000_000):
    u = {i: [math.floor(x * grain + 0.5) for x in v]
         for i, v in vecs.items()}
    sel = []
    picks = []
    for r in range(k):
        best = None
        for i in sorted(u):
            if i in sel:
                continue
            if sel:
                ms = max(sum(a * b for a, b in zip(u[i], u[j]))
                         for j in sel)
                obj = 2 * rels[i] - ms
            else:
                obj = 2 * rels[i]
            if best is None or obj > best[1]:
                best = (i, obj)
        sel.append(best[0])
        picks.append((r, best[0], best[1]))
    return picks


def test_mmr_matches_brute_force(spark):
    rng = np.random.default_rng(8)
    vecs = {i: [float(x) for x in rng.normal(size=4)] for i in range(25)}
    rels = {i: int(rng.integers(0, 1_000_000)) for i in range(25)}
    df = spark.createDataFrame(
        [(i, rels[i], vecs[i]) for i in range(25)],
        "vec_id long, rel_u long, embedding array<double>")
    got = [(r.rank, r.vec_id, r.objective_u)
           for r in mmr_select(df, k=4).orderBy("rank").collect()]
    assert got == _mmr_brute(vecs, rels, 4)


def test_mmr_prefers_diversity_over_pure_relevance(spark):
    # two near-identical high-relevance vectors: MMR must not pick both
    rows = [
        (0, 1_000_000, [1.0, 0.0]),
        (1, 999_999, [1.0, 0.0001]),   # near-dup of 0, almost as relevant
        (2, 500_000, [0.0, 1.0]),      # orthogonal, mid relevance
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, rel_u long, embedding array<double>")
    got = [r.vec_id for r in mmr_select(df, k=2).orderBy("rank").collect()]
    assert got == [0, 2]


def test_mmr_empty_and_bad_k(spark):
    df = spark.createDataFrame(
        [], "vec_id long, rel_u long, embedding array<double>")
    assert mmr_select(df, k=2).count() == 0
    with pytest.raises(ValueError):
        mmr_select(df, k=0)


# -------------------------------------------------------- rate_limit_plan


def test_rate_limit_quota_enforced(spark):
    rows = []
    for i in range(8):  # user a: 8 events in one minute window
        rows.append((i, "a", BASE + timedelta(seconds=i)))
    rows.append((100, "b", BASE))  # user b: single event
    rows.append((101, "a", BASE + timedelta(seconds=120)))  # next window
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = {r.event_id: (r.rank_in_window, r.allowed)
           for r in rate_limit_plan(df, window_seconds=60,
                                    quota=3).collect()}
    for i in range(8):
        assert out[i] == (i + 1, 1 if i < 3 else 0)
    assert out[100] == (1, 1)
    assert out[101] == (1, 1)  # fresh window resets the quota


def test_rate_limit_tiebreak_deterministic(spark):
    ts = BASE
    rows = [(5, "a", ts), (2, "a", ts), (9, "a", ts)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = {r.event_id: r.rank_in_window
           for r in rate_limit_plan(df, window_seconds=60,
                                    quota=1).collect()}
    assert out == {2: 1, 5: 2, 9: 3}
    with pytest.raises(ValueError):
        rate_limit_plan(df, quota=-1)


# ---------------------------------------------------- shard_shuffle_audit


def test_shuffle_audit_runs(spark):
    rows = [
        (0, 1, "x"), (0, 2, "x"), (0, 3, "y"), (0, 4, "x"),
        (1, 1, "z"), (1, 2, "z"), (1, 3, "z"),
    ]
    df = spark.createDataFrame(rows, "shard int, ord int, lang string")
    got = {r.shard: (r.n_rows, r.n_runs, r.max_run)
           for r in shard_shuffle_audit(df, "shard", "ord",
                                        "lang").collect()}
    assert got == {0: (4, 3, 2), 1: (3, 1, 3)}


def test_shuffle_audit_alternating_is_all_singletons(spark):
    rows = [(0, i, "ab"[i % 2]) for i in range(10)]
    df = spark.createDataFrame(rows, "shard int, ord int, lang string")
    r = shard_shuffle_audit(df, "shard", "ord", "lang").collect()[0]
    assert (r.n_rows, r.n_runs, r.max_run) == (10, 10, 1)
