"""NPZ feature-matrix scan/sink (SURVEY S12, rp_feature_io.py:788-803).

The reference's npz layout (npz2arff): keys ``data`` (n×d float
matrix), ``attribute_names``, optional ``filenames`` (ids) and
``labels``. Like the ARFF utility this is a small-export driver-side
format (one compressed archive); use parquet for anything large.
``npz_to_arff`` composes the scan with the ARFF sink — the reference's
npz2arff converter, minus its pandas detour.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def save_npz(
    df: DataFrame,
    path: str,
    vec_col: str = "vec",
    id_col: str = "id",
    label_col: str | None = None,
) -> str:
    """Collect (id, vec[, label]) and write the reference npz layout.
    Returns the actual path written (".npz" appended if missing)."""
    cols = [id_col, vec_col] + ([label_col] if label_col else [])
    rows = df.select(*cols).collect()
    dim = len(rows[0][1]) if rows else 0
    out = {
        "data": np.array([[float(x) for x in r[1]] for r in rows],
                         dtype=np.float64).reshape(len(rows), dim),
        "attribute_names": np.array([f"v{i + 1}" for i in range(dim)]),
        "filenames": np.array([str(r[0]) for r in rows]),
    }
    if label_col:
        out["labels"] = np.array([str(r[2]) for r in rows])
    # np.savez appends ".npz" when missing — normalize so save/load
    # agree on the same path string
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, **out)
    return path


def load_npz(spark: SparkSession, path: str) -> DataFrame:
    """npz → (id, vec[, label]) DataFrame (rp_feature_io.py:793-803
    semantics: data matrix + filenames ids + optional labels)."""
    import os

    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    npz = np.load(path, allow_pickle=False)
    data = npz["data"]
    n = data.shape[0]
    ids = (
        [str(x) for x in npz["filenames"]]
        if "filenames" in npz
        else [str(i) for i in range(n)]
    )
    if "labels" in npz:
        rows = [
            (i, [float(x) for x in v], str(l))
            for i, v, l in zip(ids, data, npz["labels"])
        ]
        schema = "id string, vec array<double>, label string"
    else:
        rows = [(i, [float(x) for x in v]) for i, v in zip(ids, data)]
        schema = "id string, vec array<double>"
    npz.close()
    return spark.createDataFrame(rows, schema)


def npz_to_arff(
    spark: SparkSession, in_file: str, out_file: str,
    relation_name: str = "features",
) -> None:
    """npz2arff converter analog (rp_feature_io.py:790-803)."""
    from .arff import save_arff

    df = load_npz(spark, in_file)
    save_arff(df, out_file, feature="vec", id_col="id", relation=relation_name)
