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
