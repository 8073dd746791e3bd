"""Time-bucketed rollups: bucketing arithmetic, incremental refresh,
open-bucket withholding, idempotence."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from rp_extract_spark.operators.rollup import (
    read_rollup,
    refresh_rollup,
    rollup_aggregate,
    time_bucket,
)

BASE = datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, n, start=0):
    rows = [(i, "u%d" % (i % 3), BASE + timedelta(minutes=start + i), float(i))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )


def test_time_bucket_floor(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 10, 59, 59),), (datetime(2024, 1, 1, 11, 0, 0),)],
        "ts timestamp",
    )
    got = [r.b for r in df.select(time_bucket(F.col("ts"), 3600).alias("b")).collect()]
    assert got == [datetime(2024, 1, 1, 10), datetime(2024, 1, 1, 11)]


def test_rollup_aggregate_counts(spark):
    ev = _events(spark, 120)  # minutes 0..119 -> hours 0 and 1
    agg = {r.bucket: r.n for r in
           rollup_aggregate(ev, 3600).collect()}
    assert agg == {BASE: 60, BASE + timedelta(hours=1): 60}


def test_incremental_refresh_and_idempotence(spark, tmp_path):
    out = str(tmp_path / "roll")
    # events through minute 129 -> complete hours 0 and 1; hour 2 open
    m1 = refresh_rollup(_events(spark, 130), out, 3600, dims=("user_id",))
    r1 = read_rollup(spark, out)
    assert {x.bucket for x in r1.collect()} == {BASE, BASE + timedelta(hours=1)}
    assert m1["total_rows"] == 2 * 3  # 2 complete hours x 3 users
    # re-run on identical input: nothing new appended
    m2 = refresh_rollup(_events(spark, 130), out, 3600, dims=("user_id",))
    assert m2["total_rows"] == m1["total_rows"]
    # more events: hour 2 completes, hour 3 open
    m3 = refresh_rollup(_events(spark, 200), out, 3600, dims=("user_id",))
    r3 = read_rollup(spark, out)
    assert {x.bucket for x in r3.collect()} == {
        BASE, BASE + timedelta(hours=1), BASE + timedelta(hours=2)}
    assert m3["total_rows"] == 3 * 3
    # hour-0 aggregates unchanged by later refreshes (immutability)
    n0 = {x.user_id: x.n for x in r3.filter(F.col("bucket") == BASE).collect()}
    assert n0 == {"u0": 20, "u1": 20, "u2": 20}


def test_stream_rollup_matches_batch(spark, tmp_path):
    """The streaming tumbling-window rollup must produce the same rows
    as the batch rollup on the same (closed) input."""
    from rp_extract_spark.streaming.extract_stream import stream_rollup

    src = str(tmp_path / "ev")
    out = str(tmp_path / "rollout")
    ckpt = str(tmp_path / "rollckpt")
    ev = _events(spark, 180)
    ev.write.parquet(src)

    def run():
        stream = spark.readStream.schema(
            "event_id long, user_id string, ts timestamp, value double"
        ).parquet(src)
        q = (
            stream_rollup(stream, watermark="10 minutes", dims=("user_id",))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # append mode flushes a window on the trigger AFTER the watermark
    # passes it — the second (no-new-data) run emits the closed windows
    run()
    run()
    got = {(r.bucket, r.user_id): (r.n, r.sum_v)
           for r in spark.read.parquet(out).collect()}
    want = {(r.bucket, r.user_id): (r.n, r.sum_v)
            for r in rollup_aggregate(ev, 3600, dims=("user_id",)).collect()}
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch aggregate exactly
    assert got
    for k, v in got.items():
        assert want[k] == v, k
