"""Forward/tolerance as-of variants + Hypothesis property tests vs
pandas merge_asof on randomized timelines."""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rp_extract_spark.operators.asof import asof_join

BASE = datetime(2024, 1, 1)


def _mk(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        [(e, BASE + timedelta(seconds=s), f"L{i}") for i, (e, s) in enumerate(left_rows)],
        "entity_id string, ts timestamp, row_id string",
    )
    right = spark.createDataFrame(
        [(e, BASE + timedelta(seconds=s), f"V{e}-{s}") for e, s in right_rows],
        "entity_id string, caption_ts timestamp, caption string",
    )
    return left, right


def _expected(left_rows, right_rows, direction, tolerance=None):
    """pd.merge_asof oracle on the same data."""
    l = pd.DataFrame(
        [
            {"entity_id": e, "ts": BASE + timedelta(seconds=s), "row_id": f"L{i}"}
            for i, (e, s) in enumerate(left_rows)
        ]
    ).sort_values("ts", kind="mergesort")
    r = (
        pd.DataFrame(
            [
                {"entity_id": e, "caption_ts": BASE + timedelta(seconds=s),
                 "caption": f"V{e}-{s}"}
                for e, s in sorted(set(right_rows))
            ]
        )
        .sort_values("caption_ts", kind="mergesort")
    )
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    m = pd.merge_asof(
        l, r, left_on="ts", right_on="caption_ts", by="entity_id",
        direction=direction, allow_exact_matches=True, **kw,
    )
    return {
        row.row_id: (row.caption if pd.notna(row.caption) else None)
        for row in m.itertuples()
    }


timelines = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 500)),
    min_size=1, max_size=25,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left_rows=timelines, right_rows=timelines,
       direction=st.sampled_from(["backward", "forward"]))
def test_asof_property_matches_merge_asof(spark, left_rows, right_rows, direction):
    left, right = _mk(spark, left_rows, right_rows)
    # dedupe right per (entity, ts) like the operator contract expects
    right = right.dropDuplicates(["entity_id", "caption_ts"])
    got = {
        r.row_id: r.caption
        for r in asof_join(left, right, direction=direction).collect()
    }
    assert got == _expected(left_rows, right_rows, direction)


def test_forward_inclusive_and_tolerance(spark):
    left, right = _mk(spark, [("a", 100), ("a", 50)], [("a", 100), ("a", 300)])
    fwd = {r.row_id: (r.caption, r.matched_ts)
           for r in asof_join(left, right, direction="forward").collect()}
    assert fwd["L0"][0] == "Va-100"  # inclusive >= at equal ts
    assert fwd["L1"][0] == "Va-100"

    tol = {r.row_id: r.caption
           for r in asof_join(left, right, direction="forward",
                              tolerance_seconds=40).collect()}
    assert tol["L0"] == "Va-100"  # gap 0 <= 40
    assert tol["L1"] is None      # gap 50 > 40

    back_tol = {r.row_id: r.caption
                for r in asof_join(left, right, direction="backward",
                                   tolerance_seconds=10).collect()}
    assert back_tol["L0"] == "Va-100" and back_tol["L1"] is None


def test_bad_direction(spark):
    left, right = _mk(spark, [("a", 1)], [("a", 1)])
    with pytest.raises(ValueError):
        asof_join(left, right, direction="nearest").collect()


def test_salted_asof_on_skewed_entities(spark):
    """Hot-entity skew (FIXTURES F2): 60% of rows on one entity; the
    salted plan must agree with the unsalted plan."""
    from rp_extract_spark.operators.asof import asof_join
    from rp_extract_spark.sources.images import captions_df, images_df

    left = images_df(spark, 300, seed=42, hot_entity_fraction=0.6).select(
        "entity_id", "ts", "image_id"
    ).cache()
    counts = {r.entity_id: r.n for r in left.groupBy("entity_id").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts["e00000"] > 0.4 * 300  # skew actually present
    right = captions_df(spark, 300, seed=42)
    a = {(r.image_id): (r.caption, r.matched_ts)
         for r in asof_join(left, right).collect()}
    b = {(r.image_id): (r.caption, r.matched_ts)
         for r in asof_join(left, right, salt=8).collect()}
    assert a == b and len(a) == 300


def test_asof_duplicate_right_ts_deterministic(spark):
    """ADVICE round 1: with duplicate (key, right_ts) rows the winner
    must be partition-order independent — the value-struct tiebreak
    elects the greatest value struct under any input layout."""
    from datetime import datetime

    from rp_extract_spark.operators.asof import asof_join, asof_join_merge

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    t1 = datetime(2024, 1, 1, 1, 0, 0)
    left = spark.createDataFrame(
        [("e", "k", t1)], "event_id string, entity_id string, ts timestamp"
    )
    dup_rows = [("k", t0, float(v)) for v in (3.0, 9.0, 1.0, 7.0)]
    results = set()
    for parts in (1, 2, 4):
        right = spark.createDataFrame(
            dup_rows, "entity_id string, caption_ts timestamp, value double"
        ).repartition(parts)
        out = asof_join(
            left, right, on="entity_id", left_ts="ts",
            right_ts="caption_ts", values=["value"],
        ).collect()[0]
        results.add((out.value, out.matched_ts))
    assert results == {(9.0, t0)}  # greatest value struct, always

    # the merge (cogroup) variant agrees
    right = spark.createDataFrame(
        dup_rows, "entity_id string, caption_ts timestamp, value double"
    ).repartition(3)
    m = asof_join_merge(
        left, right, on="entity_id", left_ts="ts", right_ts="caption_ts",
        values=["value"],
    ).collect()[0]
    assert (m.value, m.matched_ts) == (9.0, t0)


def test_asof_duplicate_null_value_loses(spark):
    """A tied (key, right_ts) row with NULL value must lose to any
    non-null value on BOTH physical strategies (Spark struct ordering
    ranks null fields lowest; merge variant uses na_position='first')."""
    from datetime import datetime

    from rp_extract_spark.operators.asof import asof_join, asof_join_merge

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    t1 = datetime(2024, 1, 1, 1, 0, 0)
    left = spark.createDataFrame(
        [("e", "k", t1)], "event_id string, entity_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", t0, None), ("k", t0, 5.0), ("k", t0, None)],
        "entity_id string, caption_ts timestamp, value double",
    ).repartition(3)
    w = asof_join(left, right, on="entity_id", left_ts="ts",
                  right_ts="caption_ts", values=["value"]).collect()[0]
    m = asof_join_merge(left, right, on="entity_id", left_ts="ts",
                        right_ts="caption_ts", values=["value"]).collect()[0]
    assert w.value == 5.0 and m.value == 5.0


def test_asof_map_values_fall_back(spark):
    """Map-typed right values are not orderable: the join must still
    plan and run (round-1 behavior), not fail analysis."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from rp_extract_spark.operators.asof import asof_join

    t0 = datetime(2024, 1, 1)
    t1 = datetime(2024, 1, 2)
    left = spark.createDataFrame(
        [("e", "k", t1)], "event_id string, entity_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", t0, {"a": "1"})],
        "entity_id string, caption_ts timestamp, attrs map<string,string>",
    )
    out = asof_join(left, right, on="entity_id", left_ts="ts",
                    right_ts="caption_ts", values=["attrs"]).collect()[0]
    assert dict(out.attrs) == {"a": "1"}


def test_asof_matches_pandas_ground_truth_random(spark):
    """Property: on random small inputs, the window-strategy as-of join
    equals pandas merge_asof computed locally (both directions)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for trial in range(5):
        n_l, n_r = int(rng.integers(1, 40)), int(rng.integers(0, 25))
        keys = ["a", "b", "c"]
        lts = rng.integers(0, 1000, n_l)
        l_pd = pd.DataFrame({
            "event_id": [f"e{i}" for i in range(n_l)],
            "entity_id": rng.choice(keys, n_l),
            "ts": pd.to_datetime(lts, unit="s"),
        })
        r_pd = pd.DataFrame({
            "entity_id": rng.choice(keys, n_r),
            "caption_ts": pd.to_datetime(rng.integers(0, 1000, n_r), unit="s"),
            "value": rng.integers(0, 100, n_r).astype(float),
        }).drop_duplicates(["entity_id", "caption_ts"])
        from rp_extract_spark.operators.asof import asof_join

        left = spark.createDataFrame(l_pd)
        right = spark.createDataFrame(r_pd)
        got = {
            r.event_id: (r.value, r.matched_ts)
            for r in asof_join(left, right, on="entity_id", left_ts="ts",
                               right_ts="caption_ts", values=["value"]).collect()
        }
        want_pd = pd.merge_asof(
            l_pd.sort_values("ts", kind="mergesort"),
            r_pd.sort_values("caption_ts", kind="mergesort"),
            left_on="ts", right_on="caption_ts", by="entity_id",
            direction="backward", allow_exact_matches=True,
        )
        for _, row in want_pd.iterrows():
            g_val, g_ts = got[row.event_id]
            if pd.isna(row.value):
                assert g_val is None and g_ts is None, row.event_id
            else:
                assert g_val == row.value, row.event_id
                assert pd.Timestamp(g_ts) == row.caption_ts, row.event_id
