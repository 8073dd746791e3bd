"""Thirty-sixth-batch operators: k-anonymity audit, data-contract
expectations, streaming bloom pre-screen gate."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.curation import (
    k_anonymity,
    validate_expectations,
)
from rp_extract_spark.operators.sketch import bloom_build, bloom_probe
from rp_extract_spark.streaming.stateful import (
    bloom_words_from_positions,
    stream_bloom_gate,
)


# ------------------------------------------------- k_anonymity


def test_k_anonymity_flags_small_classes(spark):
    rows = [("a", 1)] * 6 + [("a", 2)] * 2 + [("b", 1)]
    df = spark.createDataFrame(rows, "t string, b int")
    out = {(r["t"], r["b"]): r for r in k_anonymity(
        df, quasi_cols=("t", "b"), k=5).collect()}
    assert out[("a", 1)]["at_risk"] == 0 and out[("a", 1)]["n"] == 6
    assert out[("a", 2)]["at_risk"] == 1
    assert out[("b", 1)]["at_risk"] == 1


def test_k_anonymity_null_class(spark):
    df = spark.createDataFrame(
        [("a",), (None,), (None,)], "t string"
    )
    out = {r["t"]: r for r in k_anonymity(df, ("t",), k=2).collect()}
    assert out[None]["n"] == 2 and out[None]["at_risk"] == 0
    assert out["a"]["at_risk"] == 1


def test_k_anonymity_requires_columns(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        k_anonymity(df, (), k=5)


# ------------------------------------------------- validate_expectations


def _tbl(spark):
    return spark.createDataFrame(
        [
            (1, 50, "en", "src1"),
            (2, 5, "xx", "src2"),
            (None, 500, "en", "weird"),
        ],
        "id long, n int, lang string, source string",
    )


def test_expectations_counts(spark):
    rules = [
        ("id_nn", "not_null", "id", None),
        ("n_min", "min", "n", 10),
        ("n_max", "max", "n", 400),
        ("lang_ok", "in_set", "lang", ["en", "de"]),
        ("src_ok", "regex", "source", "src[0-9]+"),
    ]
    out = {r["rule"]: r for r in validate_expectations(
        _tbl(spark), rules).collect()}
    assert out["id_nn"]["n_violations"] == 1 and not out["id_nn"]["passed"]
    assert out["n_min"]["n_violations"] == 1
    assert out["n_max"]["n_violations"] == 1
    assert out["lang_ok"]["n_violations"] == 1
    assert out["src_ok"]["n_violations"] == 1
    assert all(r["n_rows"] == 3 for r in out.values())


def test_expectations_regex_is_full_match(spark):
    df = spark.createDataFrame([("srcX1",)], "source string")
    out = validate_expectations(
        df, [("s", "regex", "source", "src[0-9]+")]
    ).collect()[0]
    # 'srcX1' CONTAINS no full match — rlike alone would pass 'src1'
    # inside a longer string; the anchored pattern must reject it
    assert out["n_violations"] == 1


def test_expectations_unknown_kind(spark):
    with pytest.raises(ValueError):
        validate_expectations(_tbl(spark), [("x", "between", "n", 1)])


# ------------------------------------------------- stream_bloom_gate


def test_stream_bloom_gate_matches_batch_probe(spark, tmp_path):
    hist = spark.createDataFrame(
        [(f"img{i:04d}",) for i in range(0, 40, 2)], "image_id string"
    )
    bloom = bloom_build(hist, "image_id", m_bits=512, k=3)
    words = bloom_words_from_positions(
        [r["pos"] for r in bloom.collect()], 512
    )

    base = datetime(2024, 1, 1)
    rows = [
        (f"img{i:04d}", base + timedelta(seconds=i)) for i in range(40)
    ]
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        rows, "image_id string, ts timestamp"
    ).write.parquet(src)

    stream = spark.readStream.schema("image_id string, ts timestamp").parquet(
        src
    )
    gated = stream_bloom_gate(
        stream, words, key_col="image_id", m_bits=512, k=3
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("bloomgate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["image_id"]: r["maybe_seen"]
        for r in spark.table("bloomgate").collect()
    }

    batch = bloom_probe(
        spark.createDataFrame(rows, "image_id string, ts timestamp"),
        bloom,
        "image_id",
        m_bits=512,
        k=3,
    )
    want = {r["image_id"]: r["maybe_member"] for r in batch.collect()}
    assert got == want
    # no false negatives: every historical member is a maybe
    assert all(got[f"img{i:04d}"] == 1 for i in range(0, 40, 2))
