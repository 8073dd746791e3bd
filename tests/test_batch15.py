"""Fifteenth-batch operators: autocontrast, WebDataset byte index,
priority dedup, rendezvous assignment."""

import io
import tarfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.codecs import decode_image
from rp_extract_spark.operators.curation import rendezvous_assign
from rp_extract_spark.operators.dedup import priority_dedup
from rp_extract_spark.operators.images import image_autocontrast
from rp_extract_spark.sources.images import formula_images_df
from rp_extract_spark.sources.webdataset import (
    index_webdataset,
    write_webdataset,
)


# ------------------------------------------------- image_autocontrast


def test_autocontrast_stretches_to_full_range(spark):
    imgs = formula_images_df(spark, 4)
    out = image_autocontrast(imgs).collect()
    src = {r.image_id: (bytes(r.bytes), r.fmt)
           for r in imgs.select("image_id", "bytes", "fmt").collect()}
    for r in out:
        assert r.err is None
        base = decode_image(*src[r.image_id]).astype(np.int64)
        assert (r.lo, r.hi) == (int(base.min()), int(base.max()))
        got = decode_image(bytes(r.bytes), r.fmt).astype(np.int64)
        want = ((base - r.lo) * 255) // (r.hi - r.lo) if r.hi > r.lo \
            else base
        assert np.array_equal(got, want)
        assert got.min() == 0 and got.max() == 255


def test_autocontrast_flat_image_identity(spark):
    from rp_extract_spark.codecs import encode_png

    flat = np.full((8, 8), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [("flat", bytearray(encode_png(flat)), "png")],
        "image_id string, bytes binary, fmt string")
    r = image_autocontrast(df).collect()[0]
    assert (r.lo, r.hi) == (77, 77)
    assert np.array_equal(decode_image(bytes(r.bytes), "png"), flat)


def test_autocontrast_quarantines_corrupt(spark):
    df = spark.createDataFrame(
        [("bad", bytearray(b"junk"), "png")],
        "image_id string, bytes binary, fmt string")
    r = image_autocontrast(df).collect()[0]
    assert r.err is not None and r.bytes is None


# -------------------------------------------------- index_webdataset


def test_index_offsets_match_tarfile_and_arithmetic(spark, tmp_path):
    docs = [(i, f"payload number {i} " * (i + 1)) for i in range(7)]
    df = (
        spark.createDataFrame(docs, "doc_id long, text string")
        .select(
            "doc_id",
            F.encode("text", "utf-8").alias("payload"),
            F.lit("txt").alias("ext"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )
    out_dir = str(tmp_path / "wds")
    write_webdataset(df, out_dir, id_col="doc_id", data_col="payload",
                     ext_col="ext", shard_rows=100).count()
    idx = sorted(
        index_webdataset(spark, out_dir + "/*.tar").collect(),
        key=lambda r: r.offset,
    )
    assert [r.member for r in idx] == [f"{i}.txt" for i in range(7)]
    # arithmetic replay: header at running 512-block sum
    pos = 0
    for r, (i, text) in zip(idx, docs):
        assert r.err is None
        sz = len(text.encode())
        assert r.size == sz
        assert r.offset == pos
        assert r.data_offset == pos + 512
        pos += 512 + ((sz + 511) // 512) * 512
    # byte-level check: the payload really lives at data_offset
    import glob

    shard = glob.glob(out_dir + "/*.tar")[0]
    raw = open(shard, "rb").read()
    for r, (i, text) in zip(idx, docs):
        assert raw[r.data_offset:r.data_offset + r.size] == text.encode()
    # and tarfile agrees with our offsets
    with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
        for m in tf.getmembers():
            mine = next(r for r in idx if r.member == m.name)
            assert (mine.offset, mine.data_offset, mine.size) == (
                m.offset, m.offset_data, m.size)


def test_index_corrupt_shard_isolated(spark, tmp_path):
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"\x00" * 100)  # truncated: not even one header
    rows = index_webdataset(spark, str(tmp_path / "*.tar")).collect()
    assert len(rows) == 1 and rows[0].err is not None


# ---------------------------------------------------- priority_dedup


def test_priority_dedup_lowest_priority_wins(spark):
    rows = [
        (1, "same", 9),
        (2, "same", 3),
        (3, "same", 3),
        (4, "other", 5),
    ]
    df = spark.createDataFrame(rows, "id long, text string, prio int")
    out = sorted(r.id for r in
                 priority_dedup(df, ["text"], "id", "prio").collect())
    # group "same": min (prio, id) = (3, 2); group "other": id 4
    assert out == [2, 4]


def test_priority_dedup_keeps_all_columns(spark):
    rows = [(1, "t", 1, "x"), (2, "t", 2, "y")]
    df = spark.createDataFrame(
        rows, "id long, text string, prio int, extra string")
    out = priority_dedup(df, ["text"], "id", "prio").collect()
    assert len(out) == 1 and out[0].extra == "x"
    assert set(out[0].asDict()) == {"id", "text", "prio", "extra"}


# ------------------------------------------------- rendezvous_assign


def test_rendezvous_matches_python_replay(spark):
    import hashlib

    df = spark.createDataFrame(
        [(i,) for i in range(50)], "doc_id long")
    got = {r.doc_id: r.worker
           for r in rendezvous_assign(df, "doc_id", 5, seed=9).collect()}
    for i in range(50):
        want = max(
            range(5),
            key=lambda w: (
                hashlib.md5(f"{i}:{w}:9".encode()).hexdigest(), w),
        )
        assert got[i] == want


def test_rendezvous_minimal_movement_on_resize(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = {r.doc_id: r.worker
         for r in rendezvous_assign(df, "doc_id", 8, seed=1).collect()}
    b = {r.doc_id: r.worker
         for r in rendezvous_assign(df, "doc_id", 9, seed=1).collect()}
    moved = sum(1 for i in a if a[i] != b[i])
    # HRW: only keys whose argmax is the NEW worker move (~1/9);
    # allow slack for the small sample
    assert moved < 400 * 2 / 9
    # and every moved key moved TO the new worker
    assert all(b[i] == 8 for i in a if a[i] != b[i])


def test_rendezvous_rejects_bad_workers(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        rendezvous_assign(df, "doc_id", 0)
