"""Twenty-ninth-batch operators: per-session engagement stats,
per-group quantile transform, schema/profile drift audit."""

import datetime

from pyspark.sql import functions as F

from rp_extract_spark.operators.curation import quantile_transform
from rp_extract_spark.operators.resume import profile_columns, schema_drift
from rp_extract_spark.operators.windows import session_stats


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (u, datetime.datetime.utcfromtimestamp(t), i, ty)
            for u, t, i, ty in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )


# ------------------------------------------------- session_stats


def test_session_stats_splits_and_aggregates(spark):
    rows = [
        (1, 0, 1, "view"),
        (1, 100, 2, "click"),
        (1, 200, 3, "purchase"),
        (1, 5000, 4, "view"),     # gap > 1800 -> new session, bounce
    ]
    out = {
        (r["user_id"], r["session_id"]): r
        for r in session_stats(_ev(spark, rows)).collect()
    }
    s0 = out[(1, 0)]
    assert s0["n_events"] == 3 and s0["duration_s"] == 200
    assert s0["n_types"] == 3 and s0["bounce"] == 0 and s0["converted"] == 1
    s1 = out[(1, 1)]
    assert s1["n_events"] == 1 and s1["duration_s"] == 0
    assert s1["bounce"] == 1 and s1["converted"] == 0


def test_session_stats_gap_boundary_is_exclusive(spark):
    # gap of exactly 1800 s does NOT split (flag requires > gap)
    rows = [(1, 0, 1, "view"), (1, 1800, 2, "view"), (1, 3601, 3, "view")]
    out = session_stats(_ev(spark, rows)).collect()
    ids = sorted(r["session_id"] for r in out)
    assert ids == [0, 1]  # first two merged, third splits (1801 > 1800)


# ------------------------------------------------- quantile_transform


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, v double")


def test_quantile_transform_exact_grid(spark):
    rows = [("a", i, float(i)) for i in range(5)]  # ranks 1..5, n=5
    out = {r["id"]: r for r in quantile_transform(
        _vals(spark, rows), "g", "v", "id").collect()}
    assert out[0]["pct_u"] == 0
    assert out[1]["pct_u"] == 250000
    assert out[4]["pct_u"] == 1000000


def test_quantile_transform_singleton_centers(spark):
    out = quantile_transform(
        _vals(spark, [("a", 1, 9.0)]), "g", "v", "id"
    ).collect()
    assert out[0]["pct_u"] == 500000


def test_quantile_transform_large_rank_no_overflow(spark):
    # rank * grain overflows int32 past rank 2148 — regression for the
    # ANSI-mode overflow found at sf0.1
    rows = [("a", i, float(i)) for i in range(3000)]
    out = quantile_transform(_vals(spark, rows), "g", "v", "id")
    mx = out.agg(F.max("pct_u")).first()[0]
    assert mx == 1000000


# ------------------------------------------------- schema_drift


def test_profile_columns_exact(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x")], "a long, b string"
    )
    prof = dict((c, (n, nl, nd)) for c, n, nl, nd in profile_columns(df))
    assert prof["a"] == (3, 0, 3)
    assert prof["b"] == (3, 1, 1)


def test_schema_drift_statuses(spark):
    old = spark.createDataFrame(
        [(1, "x", 10.0)], "id long, keep string, gone double"
    )
    new = spark.createDataFrame(
        [(1, "x", 5)], "id long, keep string, fresh int"
    ).withColumn("id", F.col("id").cast("int"))
    out = {r["column"]: r for r in schema_drift(old, new).collect()}
    assert out["id"]["status"] == "type_changed"
    assert out["id"]["old_type"] == "bigint" and out["id"]["new_type"] == "int"
    assert out["keep"]["status"] == "ok"
    assert out["gone"]["status"] == "dropped" and out["gone"]["new_n"] is None
    assert out["fresh"]["status"] == "added" and out["fresh"]["old_n"] is None


def test_schema_drift_null_rate_delta(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "id long, c string")
    new = spark.createDataFrame([(1, None), (2, "b")], "id long, c string")
    out = {r["column"]: r for r in schema_drift(old, new).collect()}
    assert out["c"]["old_nulls"] == 0 and out["c"]["new_nulls"] == 1
    assert out["c"]["old_distinct"] == 2 and out["c"]["new_distinct"] == 1
