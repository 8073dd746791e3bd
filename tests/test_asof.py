"""As-of join: window impl vs merge_asof impl vs DuckDB ASOF oracle,
zero-leakage property, tie rule, skew salting equivalence."""

import duckdb
from datetime import datetime
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.asof import asof_join, asof_join_merge
from rp_extract_spark.sources.images import captions_df, images_df

N = 80


@pytest.fixture(scope="module")
def sides(spark):
    left = images_df(spark, N, seed=42).select("entity_id", "ts", "image_id").cache()
    right = captions_df(spark, N, seed=42).cache()
    left.count(), right.count()
    return left, right


def _collect_map(df, ts_name="matched_ts"):
    return {
        (r.entity_id, r.ts, r.image_id): (r.caption, getattr(r, ts_name))
        for r in df.collect()
    }


def test_asof_matches_duckdb(spark, sides):
    left, right = sides
    got = _collect_map(asof_join(left, right))
    lp = left.toPandas()
    rp = right.toPandas()
    con = duckdb.connect()
    con.register("l", lp)
    con.register("r", rp)
    want = con.sql(
        """
        SELECT l.entity_id, l.ts, l.image_id, r.caption, r.caption_ts AS matched_ts
        FROM l ASOF LEFT JOIN r
          ON l.entity_id = r.entity_id AND l.ts >= r.caption_ts
        """
    ).fetchall()
    assert len(want) == len(got)
    for ent, ts, img, cap, mts in want:
        g_cap, g_mts = got[(ent, ts, img)]
        assert g_cap == cap and g_mts == mts, (ent, ts, img)


def test_asof_matches_merge_variant(spark, sides):
    left, right = sides
    a = _collect_map(asof_join(left, right))
    b = _collect_map(asof_join_merge(left, right))
    assert a == b


def test_zero_temporal_leakage(spark, sides):
    """Perturbing all strictly-future captions must not change output."""
    left, right = sides
    base = _collect_map(asof_join(left, right))
    max_ts = left.agg(F.max("ts")).collect()[0][0]
    # captions strictly after every left ts, with poisoned values
    poison = right.withColumn(
        "caption_ts", F.col("caption_ts") + F.expr("INTERVAL 10 YEARS")
    ).withColumn("caption", F.lit("LEAKED"))
    perturbed = _collect_map(asof_join(left, right.unionByName(poison)))
    assert base == perturbed
    assert not any(v[0] == "LEAKED" for v in perturbed.values())


def test_tie_rule_inclusive_and_last_wins(spark):
    left = spark.createDataFrame(
        [("e1", datetime.fromisoformat("2024-01-01 00:10:00"), "a")],
        "entity_id string, ts timestamp, image_id string",
    )
    right = spark.createDataFrame(
        [
            ("e1", datetime.fromisoformat("2024-01-01 00:05:00"), "early"),
            ("e1", datetime.fromisoformat("2024-01-01 00:10:00"), "exact"),
            ("e1", datetime.fromisoformat("2024-01-01 00:11:00"), "late"),
        ],
        "entity_id string, caption_ts timestamp, caption string",
    )
    r = asof_join(left, right).collect()[0]
    assert r.caption == "exact"  # inclusive <=
    # unmatched -> null, inner -> dropped
    left2 = spark.createDataFrame(
        [("e1", datetime.fromisoformat("2024-01-01 00:01:00"), "b")],
        "entity_id string, ts timestamp, image_id string",
    )
    r2 = asof_join(left2, right).collect()[0]
    assert r2.caption is None and r2.matched_ts is None
    assert asof_join(left2, right, how="inner").count() == 0


def test_salted_asof_equivalence(spark, sides):
    left, right = sides
    assert _collect_map(asof_join(left, right)) == _collect_map(
        asof_join(left, right, salt=4)
    )
