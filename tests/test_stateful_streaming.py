"""Stateful streaming dedup: first occurrence passes, replays dropped
across micro-batches via keyed state."""

from datetime import datetime, timedelta

from rp_extract_spark.streaming.stateful import streaming_dedup

BASE = datetime(2024, 1, 1)


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "stream")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows):
        spark.createDataFrame(rows, "image_id string, ts timestamp").write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema("image_id string, ts timestamp").parquet(src)
        q = (
            streaming_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: a twice, b once
    write_batch(
        [
            ("a", BASE),
            ("a", BASE + timedelta(seconds=10)),
            ("b", BASE + timedelta(seconds=5)),
        ]
    )
    run()
    out1 = {r.key: (r.first_ts, r.n_dropped) for r in spark.read.parquet(out).collect()}
    assert set(out1) == {"a", "b"}
    assert out1["a"] == (BASE, 1)
    assert out1["b"][1] == 0

    # batch 2: replays of a and b (must emit nothing), new key c
    write_batch([("a", BASE + timedelta(minutes=5)), ("b", BASE), ("c", BASE)])
    run()
    rows = spark.read.parquet(out).collect()
    assert {r.key for r in rows} == {"a", "b", "c"}
    assert len(rows) == 3  # no duplicate emissions for a/b
