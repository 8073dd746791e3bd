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


def test_streaming_enrich_asof_across_batches(spark, tmp_path):
    """Streaming as-of enrich: exact as-of within a batch; keyed state
    carries the latest right row across batches."""
    from rp_extract_spark.streaming.stateful import streaming_enrich_asof

    lsrc = str(tmp_path / "left")
    rsrc = str(tmp_path / "right")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write(path, rows, schema):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(path)

    def run():
        left = spark.readStream.schema(
            "event_id string, entity_id string, ts timestamp"
        ).parquet(lsrc)
        right = spark.readStream.schema(
            "entity_id string, ts timestamp, value double"
        ).parquet(rsrc)
        q = (
            streaming_enrich_asof(left, right, key="entity_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = lambda s: BASE + timedelta(seconds=s)
    # batch 1: right r@0 (v=1.0), left e1@10 -> 1.0; left e0@-5 -> null
    write(rsrc, [("k", t(0), 1.0)], "entity_id string, ts timestamp, value double")
    write(lsrc, [("e1", "k", t(10)), ("e0", "k", t(-5))],
          "event_id string, entity_id string, ts timestamp")
    run()
    got = {r.event_id: (r.matched_value, r.matched_ts)
           for r in spark.read.parquet(out).collect()}
    assert got["e1"] == (1.0, t(0))
    assert got["e0"] == (None, None)

    # batch 2: e4@12 before the new right@15 (within-batch order!),
    # right r@15 (v=2.0), e2@20 after it; e5 on an unseen key -> null
    write(rsrc, [("k", t(15), 2.0)], "entity_id string, ts timestamp, value double")
    write(lsrc, [("e4", "k", t(12)), ("e2", "k", t(20)), ("e5", "kk", t(9))],
          "event_id string, entity_id string, ts timestamp")
    run()
    got = {r.event_id: (r.matched_value, r.matched_ts)
           for r in spark.read.parquet(out).collect()}
    assert got["e4"] == (1.0, t(0))      # state from batch 1, right@15 not yet passed
    assert got["e2"] == (2.0, t(15))     # within-batch as-of
    assert got["e5"] == (None, None)

    # batch 3: no new right rows; state must still serve 2.0
    write(lsrc, [("e6", "k", t(100))],
          "event_id string, entity_id string, ts timestamp")
    run()
    got = {r.event_id: r.matched_value for r in spark.read.parquet(out).collect()}
    assert got["e6"] == 2.0


def test_streaming_enrich_multichunk_batch(spark, tmp_path):
    """One key, >1024 unioned rows in a single micro-batch: the exact
    within-batch as-of must hold across Arrow chunk boundaries."""
    from rp_extract_spark.streaming.stateful import streaming_enrich_asof

    lsrc = str(tmp_path / "left2")
    rsrc = str(tmp_path / "right2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    n = 1500  # > arrow batch size (1024)
    left_rows = [(f"e{i:05d}", "k", BASE + timedelta(seconds=2 * i + 1))
                 for i in range(n)]
    right_rows = [("k", BASE + timedelta(seconds=2 * i), float(i))
                  for i in range(n)]
    spark.createDataFrame(
        left_rows, "event_id string, entity_id string, ts timestamp"
    ).write.parquet(lsrc)
    spark.createDataFrame(
        right_rows, "entity_id string, ts timestamp, value double"
    ).write.parquet(rsrc)
    left = spark.readStream.schema(
        "event_id string, entity_id string, ts timestamp").parquet(lsrc)
    right = spark.readStream.schema(
        "entity_id string, ts timestamp, value double").parquet(rsrc)
    q = (
        streaming_enrich_asof(left, right, key="entity_id")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {r.event_id: r.matched_value for r in spark.read.parquet(out).collect()}
    assert len(got) == n
    # left event at 2i+1 must see right value i exactly
    for i in (0, 500, 1023, 1024, 1025, 1499):
        assert got[f"e{i:05d}"] == float(i), i
