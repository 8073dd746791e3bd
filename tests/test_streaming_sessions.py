"""Streaming session_window aggregation with watermarked late data."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from rp_extract_spark.streaming.extract_stream import stream_session_stats

BASE = datetime(2024, 1, 1)


def test_stream_session_stats(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = []
    # entity e0: two sessions separated by a 2h gap
    for s in [0, 300, 600]:
        rows.append(("e0", BASE + timedelta(seconds=s)))
    for s in [10800, 11100]:
        rows.append(("e0", BASE + timedelta(seconds=s)))
    # entity e1: one session
    rows.append(("e1", BASE + timedelta(seconds=50)))
    spark.createDataFrame(rows, "entity_id string, ts timestamp").write.parquet(src)

    stream = spark.readStream.schema("entity_id string, ts timestamp").parquet(src)
    agg = stream_session_stats(spark, stream, gap="30 minutes", watermark="4 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.entity_id, r.session_start, r.n_events)
        for r in spark.table("sessions").collect()
    }
    assert got == {
        ("e0", BASE, 3),
        ("e0", BASE + timedelta(seconds=10800), 2),
        ("e1", BASE + timedelta(seconds=50), 1),
    }
