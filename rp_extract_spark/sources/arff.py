"""ARFF export/import (SURVEY S11, rp_feature_io.py:517-543 /
:494-509): the Weka interchange format the reference emits for feature
vectors. Small-export utility — ARFF is a single headered text file, so
this collects through the driver (documented; use CSV/parquet for
anything large)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def save_arff(
    df: DataFrame, path: str, feature: str, id_col: str = "image_id",
    relation: str = "features", dim: int | None = None,
) -> None:
    """Write ``@relation/@attribute`` header + one numeric row per
    entity (id as a string attribute, vector elements as numeric
    attributes v1..vN)."""
    rows = df.select(id_col, feature).collect()
    if dim is None:
        dim = len(rows[0][1]) if rows else 0
    with open(path, "w") as f:
        f.write(f"@relation {relation}\n\n")
        f.write(f"@attribute id string\n")
        for i in range(dim):
            f.write(f"@attribute v{i + 1} numeric\n")
        f.write("\n@data\n")
        for r in rows:
            vec = ",".join(repr(float(x)) for x in r[1])
            f.write(f"'{r[0]}',{vec}\n")


def load_arff(spark: SparkSession, path: str) -> DataFrame:
    """Parse the numeric-vector ARFF subset back to (id, vec)."""
    ids, vecs = [], []
    in_data = False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            if line.lower().startswith("@data"):
                in_data = True
                continue
            if line.startswith("@"):
                continue
            if in_data:
                parts = line.split(",")
                ids.append(parts[0].strip("'\""))
                vecs.append([float(x) for x in parts[1:]])
    return spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)], "id string, vec array<double>"
    )
