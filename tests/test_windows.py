"""Window suite vs DuckDB window-SQL oracle on the driver's events table."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.windows import (
    backward_fill,
    forward_fill,
    lag_lead_stack,
    rolling_stats,
    sessionize,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    return c


def _cmp(got_rows, want_rows):
    assert len(got_rows) == len(want_rows)
    for g, w in zip(got_rows, want_rows):
        assert g == w, (g, w)


def test_lag_lead(spark, events, con):
    got = (
        lag_lead_stack(
            events, "value", lags=(1, 2), leads=(1,),
            entity="user_id", ts="ts", tiebreak=("event_id",),
        )
        .select("event_id", "value_lag1", "value_lag2", "value_lead1")
        .orderBy("event_id")
        .collect()
    )
    want = con.sql(
        """
        SELECT event_id,
               lag(value, 1) OVER w AS value_lag1,
               lag(value, 2) OVER w AS value_lag2,
               lead(value, 1) OVER w AS value_lead1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
        """
    ).fetchall()
    _cmp([tuple(r) for r in got], want)


def test_forward_backward_fill(spark, events, con):
    # introduce nulls deterministically, then ffill
    base = events.withColumn(
        "v", F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("value"))
    )
    got = (
        forward_fill(base, ["v"], entity="user_id", ts="ts", tiebreak=("event_id",))
        .select("event_id", "v")
        .orderBy("event_id")
        .collect()
    )
    want = con.sql(
        """
        SELECT event_id,
               last_value(CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        FROM events ORDER BY event_id
        """
    ).fetchall()
    _cmp([tuple(r) for r in got], want)

    got_b = (
        backward_fill(base, ["v"], entity="user_id", ts="ts", tiebreak=("event_id",))
        .select("event_id", "v")
        .orderBy("event_id")
        .collect()
    )
    want_b = con.sql(
        """
        SELECT event_id,
               first_value(CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v
        FROM events ORDER BY event_id
        """
    ).fetchall()
    _cmp([tuple(r) for r in got_b], want_b)


def test_sessionize(spark, events, con):
    got = (
        sessionize(events, gap_seconds=1800, entity="user_id", ts="ts",
                   tiebreak=("event_id",))
        .select("event_id", "session_id")
        .orderBy("event_id")
        .collect()
    )
    want = con.sql(
        """
        SELECT event_id,
               sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                      THEN 1 ELSE 0 END AS flag
          FROM events)
        ORDER BY event_id
        """
    ).fetchall()
    _cmp([tuple(r) for r in got], want)


def test_rolling_stats(spark, events, con):
    got = (
        rolling_stats(events, "value", n=5, entity="user_id", ts="ts",
                      tiebreak=("event_id",))
        .select("event_id", "value_rmean5", "value_rmin5", "value_rmax5")
        .orderBy("event_id")
        .collect()
    )
    want = con.sql(
        """
        SELECT event_id,
               avg(value) OVER w AS m, min(value) OVER w AS mn, max(value) OVER w AS mx
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    ).fetchall()
    for g, w in zip(got, want):
        assert g.event_id == w[0]
        assert abs(g.value_rmean5 - w[1]) < 1e-9
        assert g.value_rmin5 == w[2] and g.value_rmax5 == w[3]
