"""Fourteenth-batch operators: ROC curve points, MLM masking plan,
P×K class-balanced batches, streaming sessionization."""

import hashlib
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.classify import auc_roc, roc_points
from rp_extract_spark.operators.curation import pk_batches
from rp_extract_spark.operators.text import mlm_mask_plan

BASE = datetime(2024, 1, 1)


# ---------------------------------------------------------- roc_points


def _roc_brute(pairs, grain=1_000_000):
    out = {}
    pos = sum(y for _, y in pairs)
    neg = len(pairs) - pos
    for t in sorted({s for s, _ in pairs}, reverse=True):
        ge = [(s, y) for s, y in pairs if s >= t]
        tp = sum(y for _, y in ge)
        fp = len(ge) - tp
        out[t] = (len(ge), tp, fp, (tp * grain) // pos,
                  (fp * grain) // neg)
    return out


def test_roc_points_brute_force(spark):
    pairs = [(10, 1), (9, 1), (8, 0), (7, 1), (7, 0), (5, 0), (4, 1),
             (3, 0), (2, 0), (1, 0)]
    df = spark.createDataFrame(pairs, "score_u long, label int")
    got = {r["score"]: (r["n_ge"], r["tp"], r["fp"], r["tpr_u"],
                        r["fpr_u"])
           for r in roc_points(df, "score_u", "label").collect()}
    assert got == _roc_brute(pairs)


def test_roc_points_many_buckets_cross_bucket_prefix(spark):
    # force multiple buckets so the driver base offsets matter
    pairs = [(i, 1 if i % 3 == 0 else 0) for i in range(1000)]
    df = spark.createDataFrame(pairs, "score_u long, label int")
    got = {r["score"]: (r["n_ge"], r["tp"], r["fp"], r["tpr_u"],
                        r["fpr_u"])
           for r in roc_points(df, "score_u", "label",
                               n_buckets=7).collect()}
    assert got == _roc_brute(pairs)


def test_roc_points_empty(spark):
    df = spark.createDataFrame([], "score_u long, label int")
    assert roc_points(df, "score_u", "label").count() == 0


def test_roc_endpoints_and_auc_consistency(spark):
    pairs = [(i * 17 % 97, (i * 13 % 7) < 3) for i in range(200)]
    pairs = [(s, int(y)) for s, y in pairs]
    df = spark.createDataFrame(pairs, "score_u long, label int")
    rows = roc_points(df, "score_u", "label").orderBy(
        F.col("score").desc()).collect()
    # lowest threshold includes everything
    assert rows[-1]["tpr_u"] == 1_000_000 and rows[-1]["fpr_u"] == 1_000_000
    # counts are monotone non-decreasing as the threshold drops
    for a, b in zip(rows, rows[1:]):
        assert b["tp"] >= a["tp"] and b["fp"] >= a["fp"]
    # the trapezoid integral of the exact counts equals auc_roc
    p = rows[-1]["tp"]
    n = rows[-1]["fp"]
    area2 = 0
    prev_tp = prev_fp = 0
    for r in rows:
        area2 += (r["fp"] - prev_fp) * (r["tp"] + prev_tp)
        prev_tp, prev_fp = r["tp"], r["fp"]
    want = auc_roc(df, "score_u", "label").collect()[0]["auc_u"]
    assert (area2 * 1_000_000) // (2 * p * n) == want


# ------------------------------------------------------- mlm_mask_plan


def test_mlm_plan_exact_counts_and_actions(spark):
    docs = [(f"d{i}", " ".join(f"tok{j}" for j in range(10 + i)))
            for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = {r.doc_id: r for r in mlm_mask_plan(df, seed=11).collect()}
    for i in range(6):
        did = f"d{i}"
        n = 10 + i
        toks = [f"tok{j}" for j in range(n)]
        nm = (n * 15) // 100
        perm = sorted(
            range(n),
            key=lambda pos: (
                hashlib.md5(f"{did}:{pos}:11".encode()).hexdigest(), pos),
        )
        masked = set(perm[:nm])
        acts = {
            pos: int(
                hashlib.md5(f"{did}:{pos}:11:a".encode()).hexdigest()[:2],
                16) % 10
            for pos in masked
        }
        r = out[did]
        assert r.n_tokens == n and r.n_masked == nm
        assert r.n_mask_tok == sum(1 for a in acts.values() if a < 8)
        assert r.n_rand_tok == sum(1 for a in acts.values() if a == 8)
        assert r.n_keep_tok == sum(1 for a in acts.values() if a == 9)
        assert r.n_mask_tok + r.n_rand_tok + r.n_keep_tok == nm
        assert r.masked_chars == sum(len(toks[p]) for p in masked)


def test_mlm_plan_zero_token_doc_dropped(spark):
    df = spark.createDataFrame(
        [("a", "one two three four five six seven"), ("b", "   ")],
        "doc_id string, text string")
    out = mlm_mask_plan(df).collect()
    assert {r.doc_id for r in out} == {"a"}


def test_mlm_plan_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        mlm_mask_plan(df, mask_num=101)


def test_mlm_plan_seed_changes_mask_set(spark):
    text = " ".join(f"w{j}" for j in range(40))
    df = spark.createDataFrame([("a", text)], "doc_id string, text string")
    a = mlm_mask_plan(df, seed=1).collect()[0]
    b = mlm_mask_plan(df, seed=2).collect()[0]
    assert a.n_masked == b.n_masked == 6
    assert a.masked_chars != b.masked_chars  # different mask set


# --------------------------------------------------------- pk_batches


def _pk_fixture(spark, per_class):
    rows = []
    i = 0
    for lbl, n in per_class.items():
        for _ in range(n):
            rows.append((i, lbl))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, label int")


def test_pk_batches_every_batch_balanced(spark):
    df = _pk_fixture(spark, {0: 13, 1: 9, 2: 17, 3: 8, 4: 11})
    out = pk_batches(df, p=2, k=3, seed=7, epoch=0).collect()
    assert out, "expected at least one batch"
    by_batch = {}
    for r in out:
        by_batch.setdefault(r.batch_id, []).append(r)
    for bid, rows in by_batch.items():
        labels = {r.label for r in rows}
        assert len(rows) == 2 * 3
        assert len(labels) == 2  # p distinct classes
        for lbl in labels:
            mem = [r for r in rows if r.label == lbl]
            assert len(mem) == 3  # k samples each
            assert sorted(r.slot for r in mem) == [0, 1, 2]
    # rounds capped by the smallest class: 8//3 = 2 rounds,
    # (5//2)*2 = 4 class-batches per round -> 2 batches per round
    assert len(by_batch) == 4
    # no sample appears twice
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids))


def test_pk_batches_deterministic_and_epoch_varies(spark):
    df = _pk_fixture(spark, {0: 10, 1: 10, 2: 10})
    a = sorted(map(tuple, pk_batches(df, p=3, k=2, seed=1,
                                     epoch=0).collect()))
    b = sorted(map(tuple, pk_batches(df, p=3, k=2, seed=1,
                                     epoch=0).collect()))
    c = sorted(map(tuple, pk_batches(df, p=3, k=2, seed=1,
                                     epoch=1).collect()))
    assert a == b
    assert a != c


def test_pk_batches_p_exceeds_classes(spark):
    df = _pk_fixture(spark, {0: 5, 1: 5})
    with pytest.raises(ValueError):
        pk_batches(df, p=3, k=2)


def test_pk_batches_class_below_k_excluded(spark):
    # class 2 has fewer than k samples -> zero full class-batches ->
    # it drops out of the plan entirely (the long-tail rule: one tiny
    # class must not zero the whole epoch); classes 0/1 still batch
    df = _pk_fixture(spark, {0: 8, 1: 8, 2: 1})
    out = pk_batches(df, p=2, k=4).collect()
    assert out and all(r.label in (0, 1) for r in out)
    by_batch = {}
    for r in out:
        by_batch.setdefault(r.batch_id, []).append(r)
    assert len(by_batch) == 2  # 8//4 = 2 rounds x 1 batch each
    for rows in by_batch.values():
        assert len(rows) == 8 and {r.label for r in rows} == {0, 1}


# ------------------------------------------------ streaming_sessionize


def test_streaming_sessionize_parity_with_batch(spark, tmp_path):
    from rp_extract_spark.operators.windows import sessionize
    from rp_extract_spark.streaming.stateful import streaming_sessionize

    src = str(tmp_path / "stream")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    gap = 600

    def write_batch(rows):
        spark.createDataFrame(
            rows, "entity_id string, ts timestamp"
        ).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(
            "entity_id string, ts timestamp").parquet(src)
        q = (
            streaming_sessionize(stream, gap_seconds=gap)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [
        ("a", BASE),
        ("a", BASE + timedelta(seconds=30)),
        ("a", BASE + timedelta(seconds=700)),
        ("b", BASE),
    ]
    # batch 2 continues entity a inside the gap, then beyond it
    b2 = [
        ("a", BASE + timedelta(seconds=750)),
        ("a", BASE + timedelta(seconds=2000)),
        ("b", BASE + timedelta(seconds=100)),
    ]
    write_batch(b1)
    run()
    write_batch(b2)
    run()

    got = {
        (r.entity_id, r.ts): r.session_id
        for r in spark.read.parquet(out).collect()
    }
    batch_df = spark.createDataFrame(
        b1 + b2, "entity_id string, ts timestamp")
    want = {
        (r.entity_id, r.ts): r.session_id
        for r in sessionize(batch_df, gap_seconds=gap).collect()
    }
    assert got == want
    assert len(got) == 7


def test_roc_points_all_null_labels(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "score_u long, label int")
    rows = roc_points(df, "score_u", "label").collect()
    assert len(rows) == 2
    assert all(r.tp == 0 and r.fp == r.n_ge for r in rows)


def test_pk_batches_null_labels_excluded(spark):
    rows = [(i, 0 if i < 8 else (1 if i < 16 else None))
            for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    out = pk_batches(df, p=2, k=4, seed=3, epoch=0).collect()
    assert out and all(r.label in (0, 1) for r in out)
    by_batch = {}
    for r in out:
        by_batch.setdefault(r.batch_id, []).append(r)
    for rows_b in by_batch.values():
        assert len(rows_b) == 8 and {r.label for r in rows_b} == {0, 1}


def test_streaming_sessionize_long_entity_ids(spark, tmp_path):
    from rp_extract_spark.streaming.stateful import streaming_sessionize

    src = str(tmp_path / "s")
    out = str(tmp_path / "o")
    ckpt = str(tmp_path / "c")
    spark.createDataFrame(
        [(7, BASE), (7, BASE + timedelta(seconds=5000)), (9, BASE)],
        "entity_id long, ts timestamp",
    ).write.parquet(src)
    stream = spark.readStream.schema("entity_id long, ts timestamp").parquet(src)
    q = (
        streaming_sessionize(stream, gap_seconds=600)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert dict(got.dtypes)["entity_id"] == "bigint"
    rows = {(r.entity_id, r.session_id) for r in got.collect()}
    assert rows == {(7, 0), (7, 1), (9, 0)}
