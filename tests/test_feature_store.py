"""Bucketed feature store: co-located joins/windows without Exchange."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rp_extract_spark.sources.feature_store import (
    enable_bucketed_ordering,
    read_bucketed,
    write_bucketed,
)
from rp_extract_spark.sources.images import images_df


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_window_and_join_have_no_exchange(spark):
    base = images_df(spark, 60, seed=42).select("entity_id", "ts", "image_id", "phash")
    write_bucketed(base, "fs_left", n_buckets=4)
    write_bucketed(
        base.select("entity_id", "ts", F.col("phash").alias("p2")),
        "fs_right",
        n_buckets=4,
    )
    enable_bucketed_ordering(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        left = read_bucketed(spark, "fs_left")
        right = read_bucketed(spark, "fs_right")

        # entity window on the bucketed+sorted table: no shuffle
        w = Window.partitionBy("entity_id").orderBy("ts")
        windowed = left.withColumn("rn", F.row_number().over(w))
        plan_w = _plan(windowed)
        assert "Exchange" not in plan_w, plan_w

        # equi-join on the bucket key: no shuffle on either side
        joined = left.join(right, ["entity_id", "ts"])
        plan_j = _plan(joined)
        assert "Exchange" not in plan_j, plan_j
        # duplicate timestamps in the fixture fan out the self-join;
        # bucketed plan must agree with the plain (shuffled) plan
        assert joined.count() == base.join(
            base.select("entity_id", "ts", F.col("phash").alias("p2")),
            ["entity_id", "ts"],
        ).count()

        # correctness identical to the unbucketed plan
        plain = base.withColumn("rn", F.row_number().over(w))
        got = {(r.image_id, r.rn) for r in windowed.collect()}
        want = {(r.image_id, r.rn) for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS fs_left")
        spark.sql("DROP TABLE IF EXISTS fs_right")
