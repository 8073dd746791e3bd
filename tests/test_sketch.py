"""Count-min sketch: one-sided error guarantee, mergeability,
absent-key zero, weighted build."""

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.sketch import cms_estimate, count_min_sketch


def _items(spark):
    rows = ([("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5 + [("d",)] * 1)
    return spark.createDataFrame(rows, "token string")


def test_cms_estimates_upper_bound_exact(spark):
    items = _items(spark)
    sk = count_min_sketch(items, "token", depth=4, width=64)
    est = {r.key: r.est for r in
           cms_estimate(sk, ["a", "b", "c", "d", "zzz"], 4, 64).collect()}
    exact = {"a": 50, "b": 20, "c": 5, "d": 1, "zzz": 0}
    for k, ex in exact.items():
        assert est[k] >= ex  # one-sided: never undercounts
    # with 4 distinct keys in 64 buckets x 4 rows, collisions are
    # essentially impossible: estimates are exact
    assert est == exact


def test_cms_absent_key_zero_even_with_collisions(spark):
    items = _items(spark)
    sk = count_min_sketch(items, "token", depth=4, width=2)  # forced collisions
    est = {r.key: r.est for r in
           cms_estimate(sk, ["a", "zzz"], 4, 2).collect()}
    assert est["a"] >= 50  # still an upper bound under heavy collision
    assert est["zzz"] >= 0


def test_cms_grid_bounded_and_mergeable(spark):
    items = _items(spark)
    sk = count_min_sketch(items, "token", depth=3, width=16)
    assert sk.count() <= 3 * 16
    # mergeability: sketch(A) + sketch(B) cell-wise == sketch(A u B),
    # with a deterministic A/B split
    half1 = count_min_sketch(items.filter(F.col("token") <= "b"),
                             "token", 3, 16)
    half2 = count_min_sketch(items.filter(F.col("token") > "b"),
                             "token", 3, 16)
    merged = (half1.unionByName(half2).groupBy("depth", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    whole = count_min_sketch(items, "token", 3, 16)
    assert sorted(map(tuple, merged.collect())) == \
           sorted(map(tuple, whole.collect()))


def test_cms_weighted_build(spark):
    df = spark.createDataFrame([("a", 10), ("b", 3)], "token string, n int")
    sk = count_min_sketch(df, "token", depth=2, width=32, weight_col="n")
    est = {r.key: r.est for r in cms_estimate(sk, ["a", "b"], 2, 32).collect()}
    assert est == {"a": 10, "b": 3}


def test_cms_streaming_incremental(spark, tmp_path):
    """The sketch builder is source-agnostic: the same groupBy agg
    runs under Structured Streaming (complete mode), and the streamed
    grid equals the batch grid over the files seen so far."""
    src = str(tmp_path / "items")
    spark.createDataFrame([("a",)] * 9 + [("b",)] * 4, "token string") \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema("token string").parquet(src)
    q = (count_min_sketch(stream, "token", depth=3, width=32)
         .writeStream.outputMode("complete")
         .format("memory").queryName("cms_mem").start())
    try:
        q.processAllAvailable()
        batch1 = count_min_sketch(spark.read.parquet(src), "token", 3, 32)
        assert sorted(map(tuple, spark.table("cms_mem").collect())) == \
               sorted(map(tuple, batch1.collect()))
        # late-arriving files fold into the same grid
        spark.createDataFrame([("c",)] * 7, "token string") \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        batch2 = count_min_sketch(spark.read.parquet(src), "token", 3, 32)
        assert sorted(map(tuple, spark.table("cms_mem").collect())) == \
               sorted(map(tuple, batch2.collect()))
    finally:
        q.stop()
