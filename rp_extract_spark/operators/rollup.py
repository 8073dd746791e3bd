"""Time-bucketed rollups (hypertable continuous-aggregate analog).

A training-data/telemetry pipeline keeps raw events plus bucketed
rollup tables (per minute/hour/day) that refresh incrementally. Spark
has the pieces — ``window()``/timestamp arithmetic for bucketing,
parquet + the snapshot manifests (operators/resume) for incremental
append — this module composes them:

* ``time_bucket`` — deterministic bucket-start column (pure JVM
  arithmetic, works in any engine — the DuckDB oracle uses
  ``time_bucket``/``date_trunc``).
* ``rollup_aggregate`` — one groupBy per (bucket, dims) with the
  standard count/sum/min/max/avg battery.
* ``refresh_rollup`` — incremental: aggregates only buckets strictly
  newer than the rollup's high-water mark and appends them with a
  lineage manifest. Re-running with no new complete buckets appends
  nothing (idempotent); the final open bucket is withheld until it
  completes, so appended buckets are immutable — the continuous-
  aggregate contract.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def time_bucket(ts: Column, seconds: int) -> Column:
    """Bucket start (timestamp) of ``ts`` for a fixed-width bucket."""
    epoch = ts.cast("timestamp").cast("long")
    return F.timestamp_seconds((epoch - (epoch % seconds)).cast("long"))


def rollup_aggregate(
    events: DataFrame,
    bucket_seconds: int,
    dims: tuple[str, ...] = (),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Aggregate events into (bucket[, dims]) rows."""
    b = time_bucket(F.col(ts_col), bucket_seconds).alias("bucket")
    return (
        events.groupBy(b, *[F.col(d) for d in dims])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 6).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
            F.round(F.avg(value_col), 6).alias("avg_v"),
        )
    )


def refresh_rollup(
    events: DataFrame,
    out_dir: str,
    bucket_seconds: int,
    dims: tuple[str, ...] = (),
    ts_col: str = "ts",
    value_col: str = "value",
) -> dict:
    """Incrementally extend the rollup table at ``out_dir``.

    Appends aggregates for COMPLETE buckets newer than the stored
    high-water mark only (the newest, possibly still-filling bucket is
    withheld), via the snapshot+manifest writer. Returns the manifest;
    ``total_rows`` not growing across a re-run = idempotence."""
    from .resume import write_snapshot

    spark = events.sparkSession
    data_dir = os.path.join(out_dir, "data")
    try:
        existing = spark.read.parquet(data_dir)
        hwm = existing.agg(F.max("bucket")).first()[0]
    except Exception:  # first refresh
        hwm = None

    max_ts = events.agg(F.max(F.col(ts_col))).first()[0]
    if max_ts is None:
        raise ValueError("no events to roll up")
    # complete buckets only: strictly before the bucket containing max_ts
    cutoff = time_bucket(F.lit(max_ts).cast("timestamp"), bucket_seconds)
    bucketed = events.withColumn("__b", time_bucket(F.col(ts_col), bucket_seconds))
    fresh = bucketed.filter(F.col("__b") < cutoff)
    if hwm is not None:
        fresh = fresh.filter(F.col("__b") > F.lit(hwm))
    agg = rollup_aggregate(fresh, bucket_seconds, dims, ts_col, value_col)
    manifest = write_snapshot(agg, out_dir, mode="append", ts_col=None)
    if hwm is not None:
        # no silent drops: events that arrived late for already-closed
        # buckets are counted and logged — the continuous-aggregate
        # contract keeps closed buckets immutable, so these need a
        # backfill/reprocess pass, not a silent merge. NOTE: on
        # repeated refreshes over a cumulative source this counts ALL
        # rows at-or-below the HWM (previously aggregated input is
        # indistinguishable from genuinely-late arrivals without an
        # ingest timestamp — pass only-new events to get a true late
        # count).
        n_late = bucketed.filter(F.col("__b") <= F.lit(hwm)).count()
        manifest["rows_at_or_below_hwm"] = int(n_late)
        if n_late:
            logger.info(
                "refresh_rollup: %d input rows in already-closed buckets "
                "(<= high-water mark) were not merged; closed buckets are "
                "immutable — run a backfill to incorporate late data",
                n_late,
            )
    return manifest


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))


def merge_aggregates(
    old: DataFrame,
    delta: DataFrame,
    keys: "tuple[str, ...]",
    count_cols: "tuple[str, ...]" = ("n",),
    sum_cols: "tuple[str, ...]" = (),
    min_cols: "tuple[str, ...]" = (),
    max_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Merge two partial aggregate tables into the aggregate of the
    union — the mergeable-state discipline every incremental pipeline
    needs (counts and sums add, mins/maxes fold; averages are NOT
    mergeable, which is why callers carry (n, sum) and defer the
    division). Union + one groupBy on the keys: both inputs are
    already K-row aggregate tables, so this never touches base data —
    the whole point of incremental maintenance at 100 TB."""
    u = old.unionByName(delta)
    aggs = (
        [F.sum(c).alias(c) for c in count_cols]
        + [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return u.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
