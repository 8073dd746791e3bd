"""End-to-end extraction over the synthetic image table."""

import numpy as np
import pytest

from rp_extract_spark.codecs import decode_image
from rp_extract_spark.functions.kernel import extract_segment_features
from rp_extract_spark.operators.extract import (
    aggregate_entity_features,
    extract_features,
    quarantine,
)
from rp_extract_spark.sources.images import captions_df, images_df

N = 60


@pytest.fixture(scope="module")
def images(spark):
    return images_df(spark, N, seed=42).cache()


def test_image_table_schema_and_determinism(spark, images):
    rows = images.orderBy("image_id").collect()
    assert len(rows) == N
    again = images_df(spark, N, seed=42).orderBy("image_id").collect()
    for a, b in zip(rows, again):
        assert a.image_id == b.image_id
        assert bytes(a.bytes) == bytes(b.bytes)
        assert a.phash == b.phash and a.ts == b.ts
    fmts = {r.fmt for r in rows}
    assert fmts == {"png", "jpeg"}
    # entity timelines are non-decreasing with duplicates present
    by_ent = {}
    for r in sorted(rows, key=lambda r: (r.entity_id, int(r.image_id[3:]))):
        by_ent.setdefault(r.entity_id, []).append(r.ts)
    assert all(ts == sorted(ts) for ts in by_ent.values())


def test_extract_matches_local_kernel(spark, images):
    feats = {r.image_id: r for r in extract_features(images).collect()}
    src = images.collect()
    assert len(feats) == len(src)
    for r in src:
        got = feats[r.image_id]
        assert got.err is None, got.err
        want = extract_segment_features(decode_image(bytes(r.bytes), r.fmt))
        for k in ("rp", "ssd", "rh", "mvd"):
            assert np.allclose(np.array(getattr(got, k)), want[k]), (r.image_id, k)
        assert got.caption == r.caption  # exact caption equality gate
        assert got.entity_id == r.entity_id and got.ts == r.ts


def test_error_isolation(spark, images):
    from pyspark.sql import functions as F

    # corrupt one row's bytes; stage must survive and quarantine it
    broken = images.withColumn(
        "bytes",
        F.when(F.col("image_id") == "img00000003", F.lit(b"garbage")).otherwise(
            F.col("bytes")
        ),
    )
    feats = extract_features(broken)
    good, bad = quarantine(feats)
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and bad_rows[0].image_id == "img00000003"
    assert "ValueError" in bad_rows[0].err
    assert good.count() == N - 1


def test_aggregate_entity_features(spark, images):
    feats = extract_features(images).cache()
    agg = {r.entity_id: r for r in aggregate_entity_features(feats).collect()}
    pdf = feats.orderBy("ts", "image_id").collect()
    by_ent = {}
    for r in pdf:
        by_ent.setdefault(r.entity_id, []).append(r)
    assert set(agg) == set(by_ent)
    for ent, rows in by_ent.items():
        rp = np.stack([np.array(r.rp) for r in rows])
        ssd = np.stack([np.array(r.ssd) for r in rows])
        a = agg[ent]
        assert a.n_segments == len(rows)
        assert np.allclose(np.array(a.rp), np.median(rp, axis=0))
        assert np.allclose(np.array(a.ssd), np.mean(ssd, axis=0))
        assert len(a.tssd) == 168 * 7 and len(a.trh) == 60 * 7


def test_captions_fixture(spark):
    caps = captions_df(spark, N, seed=42)
    rows = caps.collect()
    assert len(rows) > 0
    keys = [(r.entity_id, r.caption_ts) for r in rows]
    assert len(keys) == len(set(keys))  # unique per (entity, ts)
