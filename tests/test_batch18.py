"""Eighteenth-batch operators: truncation report, vocab coverage,
row-level content diff."""

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.resume import row_diff
from rp_extract_spark.operators.text import truncation_report, vocab_coverage


# ------------------------------------------------- truncation_report


def test_truncation_report_exact(spark):
    docs = [("a", "w " * 10), ("b", "w " * 20), ("c", "w " * 70),
            ("d", "w " * 100), ("e", None)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r.bucket: (r.n_docs, r.total_tokens, r.truncated_docs,
                      r.lost_tokens)
           for r in truncation_report(df, max_tokens=64,
                                      bucket_width=16).collect()}
    # 10 -> bucket 0; 20 -> 1; 70 -> 4 (lost 6); 100 -> 6 (lost 36)
    assert got == {0: (1, 10, 0, 0), 1: (1, 20, 0, 0),
                   4: (1, 70, 1, 6), 6: (1, 100, 1, 36)}


def test_truncation_report_totals_reconcile(spark):
    docs = [(str(i), "tok " * (i + 1)) for i in range(100)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rep = truncation_report(df, max_tokens=50, bucket_width=10).collect()
    assert sum(r.n_docs for r in rep) == 100
    assert sum(r.total_tokens for r in rep) == sum(range(1, 101))
    want_lost = sum(n - 50 for n in range(1, 101) if n > 50)
    assert sum(r.lost_tokens for r in rep) == want_lost
    with pytest.raises(ValueError):
        truncation_report(df, max_tokens=0)


# --------------------------------------------------- vocab_coverage


def test_vocab_coverage_exact(spark):
    docs = [("a", "x x y z"), ("b", "x q q q")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    vocab = spark.createDataFrame([("x",), ("y",)], "token string")
    rows = vocab_coverage(df, vocab, top_n=5).collect()
    # 8 tokens total; hits: x*3 + y*1 = 4 -> coverage 500000
    # OOV: q*3, z*1
    assert [(r.rank, r.token, r.n) for r in rows] == [
        (1, "q", 3), (2, "z", 1)]
    assert all(r.n_tokens == 8 and r.n_oov == 4 and
               r.coverage_u == 500_000 for r in rows)


def test_vocab_coverage_full_coverage_empty_oov(spark):
    df = spark.createDataFrame([("a", "x y")], "doc_id string, text string")
    vocab = spark.createDataFrame([("x",), ("y",), ("z",)], "token string")
    assert vocab_coverage(df, vocab).collect() == []


def test_vocab_coverage_duplicate_vocab_rows_ignored(spark):
    df = spark.createDataFrame([("a", "x y y")], "doc_id string, text string")
    vocab = spark.createDataFrame([("x",), ("x",)], "token string")
    rows = vocab_coverage(df, vocab, top_n=3).collect()
    assert [(r.token, r.n) for r in rows] == [("y", 2)]
    assert rows[0].coverage_u == 333_333


# ----------------------------------------------------------- row_diff


def test_row_diff_all_categories(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id long, text string, n int")
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 41), (5, "e", 50)],
        "id long, text string, n int")
    got = {r.category: r.n
           for r in row_diff(old, new, ["text", "n"], "id").collect()}
    assert got == {"added": 1, "removed": 1, "changed": 2,
                   "unchanged": 1}


def test_row_diff_null_values_compare_equal(spark):
    old = spark.createDataFrame([(1, None, 5)], "id long, text string, n int")
    new = spark.createDataFrame([(1, None, 5)], "id long, text string, n int")
    got = {r.category: r.n
           for r in row_diff(old, new, ["text", "n"], "id").collect()}
    assert got == {"added": 0, "removed": 0, "changed": 0,
                   "unchanged": 1}


def test_row_diff_identical_tables(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "id long, text string")
    got = {r.category: r.n
           for r in row_diff(df, df, ["text"], "id").collect()}
    assert got == {"added": 0, "removed": 0, "changed": 0,
                   "unchanged": 10}
