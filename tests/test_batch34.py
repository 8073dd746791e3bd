"""Thirty-fourth-batch operators: bloom filter merge, incremental IVF
append (append-equals-rebuild)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.sketch import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)
from rp_extract_spark.operators.similarity import (
    ivf_append,
    ivf_build,
    ivf_probe_stored,
    ivf_write,
)


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_bloom_merge_equals_full_build(spark):
    a = _keys(spark, [f"a{i}" for i in range(50)])
    b = _keys(spark, [f"b{i}" for i in range(50)])
    merged = bloom_merge(
        bloom_build(a, "k", m_bits=512, k=3),
        bloom_build(b, "k", m_bits=512, k=3),
    )
    full = bloom_build(a.unionByName(b), "k", m_bits=512, k=3)
    assert sorted(r["pos"] for r in merged.collect()) == sorted(
        r["pos"] for r in full.collect()
    )


def test_bloom_merge_no_false_negatives(spark):
    a = _keys(spark, [f"a{i}" for i in range(30)])
    b = _keys(spark, [f"b{i}" for i in range(30)])
    merged = bloom_merge(
        bloom_build(a, "k", m_bits=1024, k=3),
        bloom_build(b, "k", m_bits=1024, k=3),
    )
    probed = bloom_probe(a.unionByName(b), merged, "k", m_bits=1024, k=3)
    assert probed.filter(F.col("maybe_member") == 0).count() == 0


def test_bloom_merge_requires_an_argument(spark):
    with pytest.raises(ValueError):
        bloom_merge()


def _vecs(spark, ids, dim=8):
    rows = [
        (i, [float(((i * 7 + j * 13) % 10) - 5) for j in range(dim)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_append_equals_full_rebuild(spark):
    all_ids = list(range(40))
    full = _vecs(spark, all_ids)
    cent = full.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("string").alias("centroid_label"),
        F.col("embedding").alias("centroid"),
    )
    base = full.filter(F.col("vec_id") % 5 != 0)
    delta = full.filter(F.col("vec_id") % 5 == 0)
    qv = full.filter(F.col("vec_id") == 3).first()["embedding"]

    d1 = tempfile.mkdtemp(prefix="ivf_inc_")
    ivf_write(ivf_build(base, cent), d1)
    ivf_append(delta, cent, d1)

    d2 = tempfile.mkdtemp(prefix="ivf_full_")
    ivf_write(ivf_build(full, cent), d2)

    r1 = ivf_probe_stored(spark, d1, cent, qv, k=5, nprobe=2).collect()
    r2 = ivf_probe_stored(spark, d2, cent, qv, k=5, nprobe=2).collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in r1] == [
        (r["vec_id"], round(r["score"], 9)) for r in r2
    ]


def test_ivf_append_only_writes_delta_partitions(spark):
    import os

    full = _vecs(spark, list(range(20)))
    cent = full.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").cast("string").alias("centroid_label"),
        F.col("embedding").alias("centroid"),
    )
    base = full.filter(F.col("vec_id") >= 2)
    d = tempfile.mkdtemp(prefix="ivf_files_")
    ivf_write(ivf_build(base, cent), d)
    before = {
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    }
    delta = _vecs(spark, [100, 101])
    ivf_append(delta, cent, d)
    after = {
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    }
    # append never rewrites existing base files
    assert before <= after
    assert len(after) > len(before)
