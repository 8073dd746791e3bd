"""Streaming incremental extraction: exactly-once, restart-safe."""

import os

from pyspark.sql import functions as F

from rp_extract_spark.sources.images import images_df
from rp_extract_spark.streaming.extract_stream import stream_extract


def test_stream_extract_incremental(spark, tmp_path):
    src = str(tmp_path / "images")
    out = str(tmp_path / "features")
    ckpt = str(tmp_path / "ckpt")

    # batch 1 lands
    images_df(spark, 10, seed=42).write.mode("append").parquet(src)
    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out)
    assert got1.count() == 10
    assert got1.filter(F.col("err").isNotNull()).count() == 0

    # batch 2 lands; only the new files are processed (checkpoint)
    images_df(spark, 8, seed=99).withColumn(
        "image_id", F.concat(F.lit("b2-"), F.col("image_id"))
    ).write.mode("append").parquet(src)
    q2 = stream_extract(spark, src, out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    assert got2.count() == 18
    assert got2.select("image_id").distinct().count() == 18

    # re-run with no new data: nothing duplicated (exactly-once)
    q3 = stream_extract(spark, src, out, ckpt)
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == 18
    assert os.path.isdir(ckpt)
