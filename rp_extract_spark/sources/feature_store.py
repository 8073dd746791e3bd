"""Bucketed feature store: co-located layout for shuffle-free joins.

At 10^12 rows the dominant cost of the as-of/window layer is the
exchange on ``entity_id``. Persisting both sides bucketed AND sorted by
the join key removes it: Spark's bucketed scan exposes the hash-
partitioned, in-bucket-sorted layout to the planner, so sort-merge
joins and entity windows read co-located buckets with **no Exchange**
(and with ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
also no Sort). This is the plain-Spark equivalent of the Iceberg
bucket-partitioning called for by the north_star; the snapshot/manifest
discipline lives in operators/resume.py.

Usage pattern at scale: write features and captions with the same
``n_buckets`` and key once; every downstream as-of join, ffill, lag
stack, and sessionize over entities is then exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 16,
    bucket_col: str = "entity_id",
    sort_cols: tuple[str, ...] = ("entity_id", "ts"),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed+sorted managed table (saveAsTable is
    required: bucket metadata lives in the catalog, not the files)."""
    (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def enable_bucketed_ordering(spark: SparkSession) -> None:
    """Planner settings that let bucketed scans carry their layout:

    * trust in-bucket sort order (skips the Sort under windows /
      merge-joins on the bucket+sort key);
    * allow co-partitioning on a *subset* of the join keys, so a join
      on (entity_id, ts) over entity_id-bucketed tables is
      exchange-free (hash-partitioning on entity_id already clusters
      (entity_id, ts))."""
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")


def zorder_key(x, y, bits: int = 12):
    """Z-order (Morton) interleave of two non-negative integer columns
    — the Delta/Iceberg Z-ORDER layout key: writing a table sorted (or
    range-partitioned) by this key co-locates rows that are close in
    BOTH dimensions, so a two-dimensional predicate (entity range x
    time range) prunes to a bounded set of file ranges instead of
    scanning one full dimension. Pure integer arithmetic (div/mod per
    bit, no signed shifts), identical in any SQL engine; values are
    clamped to ``bits`` bits per axis (document the domain — clamping
    saturates, it never wraps). 2*bits <= 62 keeps the key in int64."""
    from pyspark.sql import functions as F

    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    lim = (1 << bits) - 1
    cx = F.least(F.greatest(x.cast("long"), F.lit(0)), F.lit(lim))
    cy = F.least(F.greatest(y.cast("long"), F.lit(0)), F.lit(lim))
    z = F.lit(0).cast("long")
    for b in range(bits):
        # shiftrightunsigned, never a double divide-then-cast: the
        # values are clamped non-negative so logical == arithmetic
        xb = F.shiftrightunsigned(cx, b) % 2
        yb = F.shiftrightunsigned(cy, b) % 2
        z = z + xb * F.lit(1 << (2 * b)) + yb * F.lit(1 << (2 * b + 1))
    return z
