"""Multi-label class-table IO (reference classes_io.py:60-169).

The reference reads a TAB-separated table with a header row — first
column is the file id, remaining columns are category names, cells are
a positive marker (default ``'x'``), a negative marker (default empty)
or blank::

    filename    genre1  genre2  genre3
    file1       x       x
    file2               x       x

``read_multi_class_file`` (classes_io.py:60-110) replaces positive
labels with 1, negative/blank with 0, and raises on any unrecognized
cell; ``write_multi_class_table`` (:127-134) is the inverse;
``multi_class_table_tolist``/``write_multi_class_list`` (:137-169)
flatten the 0/1 matrix to per-id comma-separated positive-class lists.

Spark-first: the table is read with the CSV source (header-aware,
handles quoted ids), label replacement is a JVM ``when`` chain, the
unrecognized-entry validation aggregates offending cells distributed
and only collects the (bounded) error sample to the driver on the
failure path. The to-list flattening is array ops, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classes import normalize_key

MAX_ERROR_SAMPLE = 20


def _as_tuple(v) -> tuple[str, ...]:
    if isinstance(v, str):
        return (v,)
    return tuple(v)


def read_multi_class_file(
    spark: SparkSession,
    path: str,
    delimiter: str = "\t",
    strip_filenames: bool = False,
    replace_labels: bool = True,
    pos_labels: str | tuple[str, ...] = "x",
    neg_labels: str | tuple[str, ...] = "",
) -> DataFrame:
    """Read a multi-label class table to (id, <category int 0/1>...).

    Matches classes_io.py:60-110: positive markers -> 1, negative
    markers and empty cells -> 0, and any other cell value raises
    ``ValueError`` naming the offending (id, column, value) — the
    reference's "unrecognized entries" sanity check (:100-105). The
    reference reports 1-based row/column positions; here the id is
    reported instead (stable under distributed, unordered reads).

    With ``replace_labels=False`` the raw string cells are returned.
    """
    df = spark.read.csv(path, sep=delimiter, header=True, inferSchema=False)
    id_col, *categories = df.columns
    out = df.withColumnRenamed(id_col, "id")
    if strip_filenames:
        # classes_io.py:85 strip_filenames: path + extension, case kept
        out = out.withColumn(
            "id", normalize_key(F.col("id"), strip_path=True, strip_ext=True,
                                lowercase=False)
        )
    if not replace_labels:
        return out

    pos = _as_tuple(pos_labels)
    neg = tuple(n for n in _as_tuple(neg_labels) if n != "")
    # empty / NULL cells are negative (fillna(0), classes_io.py:96)
    def encode(c: str):
        col = F.col(c)
        e = F.when(col.isNull() | (F.trim(col) == ""), 0)
        if neg:
            e = e.when(col.isin(*neg), 0)
        return e.when(col.isin(*pos), 1).alias(c)  # else NULL = unrecognized

    encoded = out.select("id", *[encode(c) for c in categories])

    # validation: recognized cells are exactly pos/neg/blank. The check
    # is one distributed filter; the sample collect only runs on the
    # error path and is bounded.
    bad_cell = [
        F.when(F.col(f"__e_{c}").isNull(),
               F.struct(F.col("id").alias("id"), F.lit(c).alias("column"),
                        F.coalesce(F.col(c), F.lit("<null>")).alias("value")))
        for c in categories
    ]
    probe = out.select(
        "id", *categories,
        *[encode(c).alias(f"__e_{c}") for c in categories],
    ).select(F.explode(F.array_compact(F.array(*bad_cell))).alias("bad"))
    sample = probe.limit(MAX_ERROR_SAMPLE).collect()
    if sample:
        lines = [f"  {r.bad.id}: column '{r.bad.column}' = '{r.bad.value}'"
                 for r in sample]
        raise ValueError(
            "CSV contains unrecognized entries. Please correct the CSV "
            "file or define pos_labels when calling read_multi_class_file."
            "\n" + "\n".join(lines)
        )
    return encoded.select(
        "id", *[F.col(c).cast("int").alias(c) for c in categories]
    )


def write_multi_class_table(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    pos_label: str = "x",
    neg_label: str = "",
) -> list[str]:
    """Write a 0/1 multi-label matrix back to the reference table
    format (classes_io.py:127-134): 1 -> ``pos_label``, 0 ->
    ``neg_label``, TAB-separated with header. Returns the category
    column order written (= input column order)."""
    categories = [c for c in df.columns if c != id_col]
    cells = [
        F.when(F.col(c) == 1, pos_label).otherwise(neg_label).alias(c)
        for c in categories
    ]
    (
        df.select(F.col(id_col).cast("string").alias(id_col), *cells)
        .write.mode("overwrite")
        .option("header", "true")
        .option("emptyValue", "")
        .csv(path, sep="\t")
    )
    return categories


def multi_class_to_list(
    df: DataFrame,
    id_col: str = "id",
    categories: list[str] | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """0/1 matrix -> (id, classes) with ``classes`` the delimiter-joined
    positive category names in column order (classes_io.py:137-147
    multi_class_table_tolist). Pure array ops — no shuffle, no Python."""
    cats = categories or [c for c in df.columns if c != id_col]
    names = F.array_compact(
        F.array(*[F.when(F.col(c) == 1, F.lit(c)) for c in cats])
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(names, delimiter).alias("classes"),
    )


def write_multi_class_list(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    classes_col: str = "classes",
    id2_col: str | None = None,
    delimiter: str = "\t",
) -> None:
    """``id[\\tid2]\\tclasses`` lines (classes_io.py:158-169)."""
    cols = [F.col(id_col).cast("string").alias("id")]
    if id2_col is not None:
        cols.append(F.col(id2_col).cast("string").alias("id2"))
    cols.append(F.col(classes_col).alias("classes"))
    (
        df.select(*cols)
        .write.mode("overwrite")
        .option("emptyValue", "")
        .csv(path, sep=delimiter)
    )


def read_multi_class_list(
    spark: SparkSession, path: str, delimiter: str = "\t",
    list_delimiter: str = ",",
) -> DataFrame:
    """Inverse of write_multi_class_list: (id, classes array<string>)."""
    df = spark.read.csv(path, sep=delimiter, header=False)
    return df.select(
        F.col("_c0").alias("id"),
        F.when(
            F.col("_c1").isNull() | (F.col("_c1") == ""), F.array().cast("array<string>")
        ).otherwise(F.split("_c1", list_delimiter)).alias("classes"),
    )
