"""Thirty-fifth-batch operators: fixed-iteration integer PageRank,
degree-oriented triangle counting."""

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.graph import pagerank_fixed, triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ------------------------------------------------- pagerank_fixed


def test_pagerank_hub_ranks_highest(spark):
    # star: everyone links to 0; 0 links to 1
    pairs = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    r = {x["node"]: x["r"] for x in pagerank_fixed(
        _edges(spark, pairs), iters=5).collect()}
    assert r[0] == max(r.values())
    assert r[1] > r[2]  # 1 receives the hub's mass
    assert r[2] == r[3] == r[4] == r[5]  # symmetric leaves


def test_pagerank_zero_iters_is_uniform(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    out = pagerank_fixed(_edges(spark, pairs), iters=0).collect()
    assert len({x["r"] for x in out}) == 1


def test_pagerank_exact_integer_replay(spark):
    # 2-cycle: hand-compute one iteration on the micro grid
    g = 10**12
    pairs = [(0, 1), (1, 0)]
    out = {x["node"]: x["r"] for x in pagerank_fixed(
        _edges(spark, pairs), iters=1).collect()}
    n = 2
    r0 = g // n
    base = (15 * (g // n)) // 100
    expect = base + (85 * (r0 // 1)) // 100
    assert out[0] == expect and out[1] == expect


def test_pagerank_duplicate_edges_collapse(spark):
    a = pagerank_fixed(_edges(spark, [(0, 1), (0, 1), (1, 0)]), iters=3)
    b = pagerank_fixed(_edges(spark, [(0, 1), (1, 0)]), iters=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ------------------------------------------------- triangle_count


def _tri(spark, pairs):
    return triangle_count(_edges(spark, pairs)).collect()[0]


def test_triangle_single(spark):
    r = _tri(spark, [(0, 1), (1, 2), (0, 2)])
    assert r["n_triangles"] == 1 and r["n_edges"] == 3


def test_triangle_none_in_path(spark):
    r = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert r["n_triangles"] == 0


def test_triangle_direction_selfloop_dup_invariance(spark):
    # both directions given, duplicates, and a self loop: still 1
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2), (0, 1)]
    r = _tri(spark, pairs)
    assert r["n_triangles"] == 1
    assert r["n_edges"] == 3  # canonical simple edges


def test_triangle_k4_has_four(spark):
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _tri(spark, pairs)
    assert r["n_triangles"] == 4
    assert r["n_wedges"] >= 4


def test_triangle_plan_has_no_nested_loop(spark):
    import io
    from contextlib import redirect_stdout

    # plan-quality: the closing-edge probe must be a hash equi-join —
    # regression for the OR-condition BroadcastNestedLoopJoin shape
    e = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    from rp_extract_spark.operators.graph import triangle_count as tc
    # rebuild the internal join lazily by capturing the plan of the
    # wedge-close join through a small copy of the pipeline
    raw = e.select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b")).filter(
        F.col("a") != F.col("b")).distinct()
    deg = (raw.select(F.col("a").alias("node"))
           .unionByName(raw.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    wd = raw.join(da, "a").join(db, "b")
    lo = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = wd.select(F.when(lo, F.col("a")).otherwise(F.col("b")).alias("u"),
                  F.when(lo, F.col("b")).otherwise(F.col("a")).alias("v"))
    w1 = o.select(F.col("u"), F.col("v").alias("x"))
    w2 = o.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    closing = o.select(F.least("u", "v").alias("x"),
                       F.greatest("u", "v").alias("y"))
    joined = wedges.join(closing, ["x", "y"], "inner")
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    assert "NestedLoop" not in buf.getvalue()
    assert "CartesianProduct" not in buf.getvalue()
