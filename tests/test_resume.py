"""Checkpoint-resume: anti-join pruning, idempotent re-run, metrics sidecar."""

import json
import os

from rp_extract_spark.operators.extract import extract_features
from rp_extract_spark.operators.resume import (
    incremental_extract,
    pending_only,
    write_snapshot,
)
from rp_extract_spark.sources.images import images_df


def test_pending_only(spark):
    todo = images_df(spark, 20, seed=42).select("image_id")
    done = todo.limit(8)
    left = pending_only(todo, done)
    assert left.count() == 12
    assert pending_only(todo, todo).count() == 0


def test_incremental_extract_idempotent(spark, tmp_path):
    out = str(tmp_path / "features")
    imgs1 = images_df(spark, 12, seed=42)
    m1 = incremental_extract(spark, imgs1, out, extract_features)
    assert m1["total_rows"] == 12 and m1["total_errors"] == 0

    # re-run on the same input: nothing new extracted
    m2 = incremental_extract(spark, imgs1, out, extract_features)
    assert m2["total_rows"] == 12  # unchanged output
    assert spark.read.parquet(os.path.join(out, "data")).count() == 12

    # grow the input: only the delta is appended
    imgs2 = images_df(spark, 20, seed=42)
    m3 = incremental_extract(spark, imgs2, out, extract_features)
    assert m3["total_rows"] == 20
    df = spark.read.parquet(os.path.join(out, "data"))
    assert df.count() == 20
    assert df.select("image_id").distinct().count() == 20

    # metrics sidecar: one manifest per snapshot with partition rows
    mdir = os.path.join(out, "_metrics")
    manifests = [json.load(open(os.path.join(mdir, f))) for f in os.listdir(mdir)]
    assert len(manifests) == 3
    for m in manifests:
        assert sum(p["rows"] for p in m["partitions"]) == m["total_rows"]
        assert "min_ts" in m["partitions"][0]


def test_write_snapshot_metrics(spark, tmp_path):
    out = str(tmp_path / "snap")
    feats = extract_features(images_df(spark, 10, seed=42))
    man = write_snapshot(feats, out)
    assert man["total_rows"] == 10
    assert os.path.exists(os.path.join(out, "_metrics", f"{man['snapshot_id']}.json"))


def test_eta_report(spark, tmp_path):
    from rp_extract_spark.operators.resume import eta_report, write_snapshot

    out = str(tmp_path / "snap")
    df = spark.range(100).withColumnRenamed("id", "image_id")
    write_snapshot(df, out, ts_col=None)
    rep = eta_report(out, total_expected=400)
    assert rep["done"] == 100 and rep["total_expected"] == 400
    assert rep["pct"] == 25.0 and rep["n_snapshots"] == 1
    assert rep["rows_per_sec"] is not None and rep["eta_s"] is not None
    # second snapshot advances progress
    write_snapshot(spark.range(100, 200).withColumnRenamed("id", "image_id"),
                   out, ts_col=None)
    rep2 = eta_report(out, total_expected=400)
    assert rep2["done"] == 200 and rep2["n_snapshots"] == 2
    assert rep2["pct"] == 50.0


def test_snapshot_time_travel(spark, tmp_path):
    from rp_extract_spark.operators.resume import (
        list_snapshots,
        read_snapshot,
        write_snapshot,
    )

    out = str(tmp_path / "tt")
    m1 = write_snapshot(spark.range(100).withColumnRenamed("id", "image_id"),
                        out, ts_col=None)
    m2 = write_snapshot(
        spark.range(100, 250).withColumnRenamed("id", "image_id"), out,
        ts_col=None)
    snaps = list_snapshots(out)
    assert [s["snapshot_id"] for s in snaps] == [m1["snapshot_id"], m2["snapshot_id"]]
    # as-of first snapshot: later append invisible
    assert read_snapshot(spark, out, m1["snapshot_id"]).count() == 100
    # latest (default): full table
    assert read_snapshot(spark, out).count() == 250
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_snapshot(spark, out, "nope")


def test_snapshot_time_travel_partitioned(spark, tmp_path):
    """Partition columns must survive the pinned-file (basePath) read."""
    from rp_extract_spark.operators.resume import read_snapshot, write_snapshot

    out = str(tmp_path / "ttp")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "image_id long, grp string"
    )
    m = write_snapshot(df, out, ts_col=None, partition_by=("grp",))
    back = read_snapshot(spark, out, m["snapshot_id"])
    assert set(back.columns) == {"image_id", "grp"}
    assert {(r.image_id, r.grp) for r in back.collect()} == {(1, "a"), (2, "b"), (3, "a")}


def test_snapshot_diff_incremental_read(spark, tmp_path):
    """snapshot_diff returns ONLY the rows appended between two
    snapshots; empty delta keeps the schema; an intervening overwrite
    refuses (append lineage broken)."""
    import pytest as _pytest

    from rp_extract_spark.operators.resume import snapshot_diff, write_snapshot

    out = str(tmp_path / "cdc")
    m1 = write_snapshot(
        spark.createDataFrame([(1,), (2,)], "image_id long"), out,
        ts_col=None)
    m2 = write_snapshot(
        spark.createDataFrame([(3,)], "image_id long"), out, ts_col=None)
    m3 = write_snapshot(
        spark.createDataFrame([(4,), (5,)], "image_id long"), out,
        ts_col=None)
    d12 = snapshot_diff(spark, out, m1["snapshot_id"], m2["snapshot_id"])
    assert {r.image_id for r in d12.collect()} == {3}
    # default to_id = latest
    d1 = snapshot_diff(spark, out, m1["snapshot_id"])
    assert {r.image_id for r in d1.collect()} == {3, 4, 5}
    # self-diff: empty with schema
    d22 = snapshot_diff(spark, out, m2["snapshot_id"], m2["snapshot_id"])
    assert d22.count() == 0 and d22.columns == ["image_id"]
    # reversed order refuses
    with _pytest.raises(ValueError):
        snapshot_diff(spark, out, m3["snapshot_id"], m1["snapshot_id"])
    # overwrite in between refuses
    write_snapshot(
        spark.createDataFrame([(9,)], "image_id long"), out,
        mode="overwrite", ts_col=None)
    with _pytest.raises(ValueError):
        snapshot_diff(spark, out, m1["snapshot_id"])
