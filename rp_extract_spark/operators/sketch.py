"""Distributed sketches: count-min (frequency estimation without raw
data).

The prompt-side use case: token/entity frequency over a 100-TB corpus
where the exact (key, count) table is itself too hot to keep — a CMS
is a fixed depth x width grid (a few KB) built in ONE pass and ONE
shuffle, mergeable across partitions/days by cell-wise addition, and
answers point queries with one-sided error (estimate >= true count,
overshoot bounded by ~2N/width with probability 1 - 2^-depth). The
builder is source-agnostic: the same aggregate runs under Structured
Streaming (complete-mode memory/table sink) and the streamed grid
equals the batch grid over the data seen so far (tested).

Engine-portable hashing: row j's hash is the first 8 hex chars of
md5(key || '\\x1e' || 'cms' || j) taken as an integer mod width —
md5 parity with DuckDB is already established by the dedup oracles,
so the full sketch (and its estimates) recomputes EXACTLY in SQL for
the driver gate. No reference analog (the reference has no sketches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _cms_bucket(key: Column, j: int, width: int) -> Column:
    h = F.md5(F.concat(key.cast("string"), F.lit(f"\x1ecms{j}")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(width))


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (depth, bucket, cnt) with at most
    depth x width rows. One row-local explode (depth cells per input
    row) and one aggregate — a single shuffle whose payload is the
    grid, never the keys."""
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    cells = F.array(*[
        F.struct(
            F.lit(j).alias("d"),
            _cms_bucket(F.col(key_col), j, width).alias("b"),
        )
        for j in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("c"), w.alias("__w"))
        .groupBy(F.col("c.d").alias("depth"), F.col("c.b").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: "list[str]",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for a list of keys: min over the depth
    rows of each key's cells; absent cells count 0. The key list is a
    handful of constants — broadcast against the (small) sketch."""
    spark: SparkSession = sketch.sparkSession
    probes = spark.createDataFrame(
        [(k,) for k in keys], "key string"
    ).select(
        "key",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("depth"),
                     _cms_bucket(F.col("key"), j, width).alias("bucket"))
            for j in range(depth)
        ])).alias("c"),
    ).select("key", "c.depth", "c.bucket")
    # Broadcast hint goes on the BUILD side (the bounded depth×width
    # sketch) — a hint on the preserved side of a LEFT join is silently
    # ignored (Spark can't build a broadcast hash table from the stream
    # side) and the planner would fall back to a shuffle join.
    return (
        probes
        .join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
