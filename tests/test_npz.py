"""NPZ scan/sink + npz2arff converter (SURVEY S12)."""

import numpy as np

from rp_extract_spark.sources.arff import load_arff
from rp_extract_spark.sources.npz import load_npz, npz_to_arff, save_npz


def test_npz_roundtrip(spark, tmp_path):
    rows = [(f"f{i}", [float(i), float(i) * 0.5, 1.25], "cls%d" % (i % 2))
            for i in range(7)]
    df = spark.createDataFrame(rows, "id string, vec array<double>, label string")
    p = str(tmp_path / "feat.npz")
    save_npz(df, p, label_col="label")
    back = load_npz(spark, p)
    got = {r.id: (list(r.vec), r.label) for r in back.collect()}
    assert got == {i: (v, l) for i, v, l in rows}


def test_npz_reference_layout(spark, tmp_path):
    # the keys npz2arff expects (rp_feature_io.py:793-803)
    df = spark.createDataFrame(
        [("a", [1.0, 2.0])], "id string, vec array<double>"
    )
    p = str(tmp_path / "ref.npz")
    save_npz(df, p)
    npz = np.load(p)
    assert set(npz.files) == {"data", "attribute_names", "filenames"}
    assert npz["data"].shape == (1, 2)
    assert list(npz["attribute_names"]) == ["v1", "v2"]


def test_npz_to_arff(spark, tmp_path):
    df = spark.createDataFrame(
        [("x", [3.0, 4.0]), ("y", [5.0, 6.0])], "id string, vec array<double>"
    )
    p = str(tmp_path / "conv.npz")
    save_npz(df, p)
    out = str(tmp_path / "conv.arff")
    npz_to_arff(spark, p, out)
    back = load_arff(spark, out)
    got = {r.id: list(r.vec) for r in back.collect()}
    assert got == {"x": [3.0, 4.0], "y": [5.0, 6.0]}


def test_npz_extension_normalized(spark, tmp_path):
    df = spark.createDataFrame([("z", [9.0])], "id string, vec array<double>")
    base = str(tmp_path / "noext")      # no .npz suffix
    written = save_npz(df, base)
    assert written.endswith(".npz")
    # load works with either spelling
    assert load_npz(spark, base).collect()[0].id == "z"
    assert load_npz(spark, written).collect()[0].id == "z"
