"""Seventeenth-batch operators: k-center coreset selection, temporal
split with embargo."""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from rp_extract_spark.operators.curation import temporal_split
from rp_extract_spark.operators.similarity import coreset_kcenter

BASE = datetime(2024, 1, 1)


# ------------------------------------------------------ coreset_kcenter


def _kcenter_brute(vecs, k, grain=1_000_000):
    u = {i: [math.floor(x * grain + 0.5) for x in v]
         for i, v in vecs.items()}

    def sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    seed = min(u)
    picks = [(0, seed, 0)]
    sel = [seed]
    for r in range(1, k):
        best = None
        for i in sorted(u):
            d = min(sq(u[i], u[s]) for s in sel)
            if best is None or d > best[1]:
                best = (i, d)
        if best[1] == 0:
            break
        sel.append(best[0])
        picks.append((r, best[0], best[1]))
    return picks


def test_coreset_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    vecs = {i: [float(x) for x in rng.normal(size=5)] for i in range(30)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = [(r.rank, r.vec_id, r.d2)
           for r in coreset_kcenter(df, k=5).orderBy("rank").collect()]
    assert got == _kcenter_brute(vecs, 5)


def test_coreset_radius_non_increasing(spark):
    rng = np.random.default_rng(2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=4)]) for i in range(40)],
        "vec_id long, embedding array<double>")
    rows = coreset_kcenter(df, k=6).orderBy("rank").collect()
    d2s = [r.d2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(d2s, d2s[1:]))
    assert len(rows) == 6 and rows[0].d2 == 0


def test_coreset_stops_on_duplicates(spark):
    # only 2 distinct points: the third pick would have d2=0 -> stop
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    rows = coreset_kcenter(df, k=3).collect()
    assert [r.vec_id for r in sorted(rows, key=lambda r: r.rank)] == [0, 2]


def test_coreset_empty_and_bad_k(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert coreset_kcenter(df, k=3).count() == 0
    with pytest.raises(ValueError):
        coreset_kcenter(df, k=0)


# -------------------------------------------------------- temporal_split


def test_temporal_split_bands(spark):
    cutoff = "2024-01-10 00:00:00"
    rows = [
        ("before", BASE),
        ("edge_train", datetime(2024, 1, 8) - timedelta(seconds=1)),
        ("embargo_lo", datetime(2024, 1, 8)),
        ("embargo_hi", datetime(2024, 1, 10) - timedelta(seconds=1)),
        ("test_edge", datetime(2024, 1, 10)),
        ("after", datetime(2024, 1, 20)),
    ]
    df = spark.createDataFrame(rows, "name string, ts timestamp")
    got = {r.name: r.split
           for r in temporal_split(df, "ts", cutoff,
                                   embargo_seconds=2 * 86400).collect()}
    assert got == {
        "before": "train", "edge_train": "train",
        "embargo_lo": "embargo", "embargo_hi": "embargo",
        "test_edge": "test", "after": "test",
    }


def test_temporal_split_zero_embargo(spark):
    rows = [("a", datetime(2024, 1, 9, 23, 59, 59)),
            ("b", datetime(2024, 1, 10))]
    df = spark.createDataFrame(rows, "name string, ts timestamp")
    got = {r.name: r.split
           for r in temporal_split(df, "ts",
                                   "2024-01-10 00:00:00").collect()}
    assert got == {"a": "train", "b": "test"}
    with pytest.raises(ValueError):
        temporal_split(df, "ts", "2024-01-10 00:00:00",
                       embargo_seconds=-1)
