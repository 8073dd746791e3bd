"""File-based sources & sinks mirroring the reference's I/O surface.

* Directory scan (find_files, rp_extract_batch.py:46-93) →
  ``binaryFile`` source with extension + hidden-file predicates.
* File-list source (read_filenames, classes_io.py:523-535) →
  ``spark.read.text``.
* Class-file scan/sink (TAB-separated ``file\\tlabel``,
  classes_io.py:22-49 / :113-117) → CSV with ``sep='\\t'``.
* CSV feature sink/scan (``id,v1..vN`` row layout,
  rp_feature_io.py:34-91 / :302-356) → array column ↔ positional
  columns; schemaless on disk exactly like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_EXTENSIONS = ("png", "jpg", "jpeg", "bmp", "gif")


def scan_image_dir(
    spark: SparkSession,
    path: str,
    extensions: tuple[str, ...] = IMAGE_EXTENSIONS,
    recursive: bool = True,
    ignore_hidden: bool = True,
) -> DataFrame:
    """Recursive binary-file scan with the reference's predicates:
    extension filter (rp_extract_batch.py:80-81), hidden-file skip
    (:77-78), 0-byte guard (audiofile_read.py:376-379). Returns
    (path, image_id, fmt, bytes, length)."""
    # push the extension filter into file listing (pathGlobFilter is
    # case-sensitive, so the brace glob covers all-lower and all-UPPER
    # variants; mixed-case extensions like ".JpEg" are not matched —
    # acceptable: they do not occur in any sane ingest layout)
    glob = "*.{" + ",".join(
        sorted({e.lower() for e in extensions} | {e.upper() for e in extensions})
    ) + "}"
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
        .option("pathGlobFilter", glob)
        .load(path)
    )
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(fname, r"\."), -1))
    df = df.filter(ext.isin(*[e.lower() for e in extensions]))
    if ignore_hidden:
        df = df.filter(~fname.startswith("."))
    df = df.filter(F.length("content") > 0)
    return df.select(
        F.col("path"),
        F.regexp_replace(fname, r"\.[^.]*$", "").alias("image_id"),
        F.when(ext == "jpg", "jpeg").otherwise(ext).alias("fmt"),
        F.col("content").alias("bytes"),
        F.col("length"),
    )


def read_file_list(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited list of input paths (classes_io.py:523-535);
    blank lines dropped."""
    return (
        spark.read.text(path)
        .select(F.trim("value").alias("path"))
        .filter(F.length("path") > 0)
    )


def read_class_file(spark: SparkSession, path: str) -> DataFrame:
    """TAB-separated ``file\\tlabel`` (classes_io.py:22-49)."""
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("label", T.StringType())]
    )
    return spark.read.csv(path, sep="\t", schema=schema)


def write_class_file(df: DataFrame, path: str, id_col: str = "id",
                     label_col: str = "label") -> None:
    """``id\\tlabel`` lines (classes_io.py:113-117)."""
    df.select(F.col(id_col).alias("id"), F.col(label_col).alias("label")).write.mode(
        "overwrite"
    ).csv(path, sep="\t")


def write_csv_features(
    df: DataFrame, path: str, feature: str, id_col: str = "image_id", dim: int | None = None
) -> None:
    """Reference CSV feature layout: one ``id,v1..vN`` row per entity,
    schemaless/no header (rp_feature_io.py:66-85, :332)."""
    if dim is None:
        dim = len(df.select(feature).first()[0])
    cols = [F.col(id_col).cast("string").alias("id")] + [
        F.element_at(feature, i + 1).alias(f"v{i + 1}") for i in range(dim)
    ]
    df.select(*cols).write.mode("overwrite").option("header", "false").csv(path)


def read_csv_features(
    spark: SparkSession, path: str, ids_only: bool = False
) -> DataFrame:
    """Read the ``id,v1..vN`` layout back to (id, vec array<double>).
    ``ids_only`` prunes to the id column (rp_feature_io.py:347-348 —
    Catalyst pushes the pruning into the scan)."""
    df = spark.read.csv(path, header=False, inferSchema=False)
    id_col = F.col("_c0").alias("id")
    if ids_only:
        return df.select(id_col)
    vals = [F.col(c).cast("double") for c in df.columns[1:]]
    return df.select(id_col, F.array(*vals).alias("vec"))
