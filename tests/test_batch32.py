"""Thirty-second-batch: mergeable-aggregate maintenance + format
roundtrips (ORC / JSONL are covered end-to-end by the oracle gate;
tests here pin the merge algebra and the roundtrip helpers)."""

import tempfile

from pyspark.sql import functions as F

from rp_extract_spark.operators.rollup import merge_aggregates


def _agg(df):
    return df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )


def _rows(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_merge_equals_full_recompute(spark):
    a = _rows(spark, [("x", 1), ("x", 5), ("y", 2)])
    b = _rows(spark, [("x", 10), ("z", 7)])
    merged = merge_aggregates(
        _agg(a), _agg(b), keys=("g",),
        count_cols=("n",), sum_cols=("s",), min_cols=("mn",), max_cols=("mx",),
    )
    full = _agg(a.unionByName(b))
    got = {r["g"]: r for r in merged.collect()}
    want = {r["g"]: r for r in full.collect()}
    assert set(got) == set(want)
    for g in want:
        for c in ("n", "s", "mn", "mx"):
            assert got[g][c] == want[g][c], (g, c)


def test_merge_group_only_in_one_side(spark):
    a = _rows(spark, [("only_old", 3)])
    b = _rows(spark, [("only_new", 4)])
    merged = {r["g"]: r for r in merge_aggregates(
        _agg(a), _agg(b), keys=("g",),
        count_cols=("n",), sum_cols=("s",), min_cols=("mn",), max_cols=("mx",),
    ).collect()}
    assert merged["only_old"]["n"] == 1 and merged["only_new"]["n"] == 1


def test_merge_is_associative_across_three_deltas(spark):
    parts = [
        _rows(spark, [("a", i), ("b", 2 * i)]) for i in (1, 2, 3)
    ]
    kw = dict(keys=("g",), count_cols=("n",), sum_cols=("s",),
              min_cols=("mn",), max_cols=("mx",))
    m12 = merge_aggregates(_agg(parts[0]), _agg(parts[1]), **kw)
    m123 = merge_aggregates(m12, _agg(parts[2]), **kw)
    full = _agg(parts[0].unionByName(parts[1]).unionByName(parts[2]))
    got = {r["g"]: r for r in m123.collect()}
    want = {r["g"]: r for r in full.collect()}
    for g in want:
        for c in ("n", "s", "mn", "mx"):
            assert got[g][c] == want[g][c]


def test_orc_and_jsonl_roundtrip_values(spark):
    df = spark.createDataFrame(
        [(1, "line one\nline two", "en"), (2, None, None)],
        "doc_id long, text string, lang string",
    )
    for fmt in ("orc", "json"):
        d = tempfile.mkdtemp(prefix=f"rt_{fmt}_")
        df.write.mode("overwrite").format(fmt).save(d)
        back = spark.read.schema(df.schema).format(fmt).load(d)
        got = sorted(back.collect(), key=lambda r: r["doc_id"])
        assert got[0]["text"] == "line one\nline two"  # newline survives
        assert got[1]["text"] is None and got[1]["lang"] is None
