"""HDF5 feature-store interop (codecs/hdf5.py + sources/hdf5.py).

The container has no h5py/pytables, so parity with the reference's
HDF5FeatureWriter/load_hdf5_features (rp_feature_io.py:93-264,
:551-606) is enforced at the LAYOUT level: the in-repo writer emits
the pytables-EArray structure (chunked layout, v1 B-tree, unlimited
first dim, vec/file_ids/file_ids2 names, vec_dim/vec_type attrs) per
the public HDF5 File Format Specification, and the reader implements
the reference reader's semantics (length consistency, empty-ids2
collapse) against that subset plus the filters real pytables files
may carry (deflate, shuffle)."""

import random
import struct

import numpy as np
import pytest

from rp_extract_spark.codecs.hdf5 import (
    UNDEF,
    Hdf5Error,
    _Buf,
    _chunk_btree,
    _Rd,
    _walk_chunk_btree,
    read_hdf5,
    write_hdf5,
)
from rp_extract_spark.sources.hdf5 import (
    h5_feature_bytes,
    parse_h5_features,
    read_h5_features,
    read_multiple_h5_feature_files,
    write_h5_features,
)


def _matrix(n=100, dim=12, seed=0):
    return np.random.default_rng(seed).standard_normal((n, dim))


# ----------------------------------------------------------- codec

def test_codec_roundtrip_multi_chunk():
    vec = _matrix(500, 168)
    ids = np.array([f"f{i:04d}.wav".encode() for i in range(500)],
                   dtype="S256")
    data = write_hdf5(
        {"vec": vec, "file_ids": ids, "file_ids2": np.zeros(0, "S256")},
        attrs={"vec": {"vec_dim": 168, "vec_type": "SSD"}},
        chunk_rows=64,  # 8 chunks incl. a partial edge chunk
    )
    out = read_hdf5(data)
    v, a = out["vec"]
    assert np.array_equal(v, vec)
    assert a == {"vec_dim": 168, "vec_type": "SSD"}
    assert out["file_ids"][0].tolist() == ids.tolist()
    assert out["file_ids2"][0].shape == (0,)


@pytest.mark.parametrize("dtype", [np.float64, np.float32, np.int64])
def test_codec_dtypes(dtype):
    arr = (_matrix(30, 5) * 100).astype(dtype)
    v, _ = read_hdf5(write_hdf5({"x": arr}, chunk_rows=7))["x"]
    assert v.dtype == np.dtype(dtype).newbyteorder("<")
    assert np.array_equal(v, arr)


def test_codec_deflate_filter():
    vec = _matrix(200, 40, seed=3)
    data = write_hdf5({"vec": vec}, chunk_rows=50, compress=True)
    raw = write_hdf5({"vec": vec}, chunk_rows=50, compress=False)
    assert len(data) < len(raw)  # filter actually applied
    v, _ = read_hdf5(data)["vec"]
    assert np.array_equal(v, vec)


def test_codec_1d_and_empty():
    d = write_hdf5({"x": np.arange(7, dtype=np.int64),
                    "y": np.zeros((0, 4))})
    out = read_hdf5(d)
    assert out["x"][0].tolist() == list(range(7))
    assert out["y"][0].shape == (0, 4)


def test_reader_multilevel_chunk_btree():
    """Real pytables files index many chunks through internal B-tree
    nodes; the writer emits one level, so the recursion is exercised
    on a hand-built internal node pointing at two leaf nodes."""
    buf = _Buf()
    a = np.arange(8, dtype=np.int64).reshape(4, 2)
    addr0 = buf.write(a[:2].tobytes())
    addr1 = buf.write(a[2:].tobytes())
    leaf0 = _chunk_btree(buf, [((0, 0, 0), 32, addr0)], rank=2, crows=2)
    leaf1 = _chunk_btree(buf, [((2, 0, 0), 32, addr1)], rank=2, crows=2)
    buf.pad8()
    root = buf.tell()
    node = b"TREE" + struct.pack("<BBH", 1, 1, 2)  # level 1, 2 entries
    node += struct.pack("<QQ", UNDEF, UNDEF)
    for offs, child in [((0, 0, 0), leaf0), ((2, 0, 0), leaf1)]:
        node += struct.pack("<II", 32, 0)
        node += b"".join(struct.pack("<Q", o) for o in offs)
        node += struct.pack("<Q", child)
    node += struct.pack("<II", 0, 0) + struct.pack("<QQQ", 4, 0, 0)
    buf.write(node)
    chunks = []
    _walk_chunk_btree(_Rd(bytes(buf.b)), root, 3, chunks)
    assert [c[0] for c in chunks] == [(0, 0, 0), (2, 0, 0)]
    assert [c[3] for c in chunks] == [addr0, addr1]


def test_codec_fuzz_raises_hdf5error_only():
    d = write_hdf5({"vec": _matrix(50, 8)}, chunk_rows=16)
    for cut in range(0, len(d), 97):
        with pytest.raises((Hdf5Error,)):
            read_hdf5(d[:cut])
    rng = random.Random(11)
    for _ in range(200):
        b = bytearray(d)
        for _ in range(4):
            b[rng.randrange(len(b))] ^= 0xFF
        try:
            read_hdf5(bytes(b))
        except Hdf5Error:
            pass  # ValueError subclass: the codec fuzz contract


# ----------------------------------------------- reference semantics

def test_parse_consistency_error():
    vec = _matrix(10, 4)
    data = h5_feature_bytes([f"id{i}" for i in range(10)], vec)
    # corrupt: rebuild with fewer ids than rows, reader must raise the
    # reference's ValueError (rp_feature_io.py:577-580)
    bad = write_hdf5({
        "vec": vec,
        "file_ids": np.array([b"only_one"], dtype="S256"),
    })
    ids, v, ids2, attrs = parse_h5_features(data)
    assert ids == [f"id{i}" for i in range(10)] and ids2 is None
    assert attrs["vec_dim"] == 4
    with pytest.raises(ValueError, match="does not match"):
        parse_h5_features(bad)
    with pytest.raises(ValueError, match="vec"):
        parse_h5_features(write_hdf5({"x": vec}))


def test_ids2_roundtrip_and_collapse():
    vec = _matrix(5, 3)
    with_id2 = h5_feature_bytes(list("abcde"), vec,
                                ids2=[f"g{i}" for i in range(5)])
    ids, _, ids2, _ = parse_h5_features(with_id2)
    assert ids2 == ["g0", "g1", "g2", "g3", "g4"]
    without = h5_feature_bytes(list("abcde"), vec)
    assert parse_h5_features(without)[2] is None  # empty table -> None


# ----------------------------------------------------- Spark surface

def test_spark_scan_roundtrip(spark, tmp_path):
    df = spark.range(20).select(
        F_concat_id(), F_vec()
    )
    p = write_h5_features(df, str(tmp_path / "feat.ssd"), vec_type="ssd")
    assert p.endswith(".h5")
    back = read_h5_features(spark, p)
    rows = back.orderBy("file_id").collect()
    assert len(rows) == 20
    assert rows[0].file_id == "doc_00" and rows[0].vec_type == "SSD"
    assert rows[3].vec == [3.0, 6.0]
    assert rows[0].file_id2 is None


def F_concat_id():
    from pyspark.sql import functions as F
    return F.format_string("doc_%02d", "id").alias("id")


def F_vec():
    from pyspark.sql import functions as F
    return F.array(F.col("id").cast("double"),
                   (F.col("id") * 2).cast("double")).alias("vec")


def test_spark_scan_glob_parallel_files(spark, tmp_path):
    from pyspark.sql import functions as F
    base = spark.range(10).select(F_concat_id(), F_vec())
    write_h5_features(base, str(tmp_path / "store.rh.h5"), vec_type="rh")
    write_h5_features(base, str(tmp_path / "store.ssd.h5"), vec_type="ssd")
    both = read_h5_features(spark, str(tmp_path))
    assert both.count() == 20
    assert both.select("vec_type").distinct().count() == 2
    multi = read_multiple_h5_feature_files(
        spark, str(tmp_path / "store"), ["rh", "ssd"])
    got = dict(multi.groupBy("feature_type").count().collect())
    assert got == {"rh": 10, "ssd": 10}


def test_spark_scan_lenient_quarantines_bad_file(spark, tmp_path):
    base = spark.range(6).select(F_concat_id(), F_vec())
    good = write_h5_features(base, str(tmp_path / "good"))
    (tmp_path / "bad.h5").write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 40)
    # strict scan fails on the corrupt file
    with pytest.raises(Exception):
        read_h5_features(spark, str(tmp_path)).count()
    out = read_h5_features(spark, str(tmp_path), lenient=True)
    rows = out.collect()
    errs = [r for r in rows if r.err is not None]
    assert len(rows) == 7 and len(errs) == 1
    assert errs[0].path.endswith("bad.h5") and "Hdf5Error" in errs[0].err
    assert sum(r.vec is not None for r in rows) == 6
