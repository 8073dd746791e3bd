"""Round-5 seventh-wave operators: SemDeDup semantic dedup (plus the
wave's later additions). Expectations are hand computations — never the
operator's own helpers."""

from pyspark.sql import functions as F

from rp_extract_spark.operators.similarity import semdedup


def _cent(spark, rows):
    return spark.createDataFrame(
        rows, schema="centroid_label string, centroid array<double>"
    )


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<double>"
    )


def test_semdedup_keeps_farthest_from_centroid(spark):
    cent = _cent(spark, [("0", [1.0, 0.0, 0.0]), ("1", [0.0, 1.0, 0.0])])
    df = _vecs(spark, [
        # cluster 0: ids 1 and 2 are near-dups; 1 sits ON the centroid
        # (cent cos = 1.0), 2 is tilted away -> the keep rule keeps 2
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # cos(1,2) = 0.9/0.90554 ~ 0.9939
        # cluster 1: a lone member, trivially kept
        (3, [0.0, 1.0, 0.0]),
    ])
    out = {r.vec_id: r for r in semdedup(
        df, cent, threshold_u=950_000).collect()}
    assert out[1].cluster == "0" and not out[1].kept
    assert out[2].cluster == "0" and out[2].kept
    assert out[3].cluster == "1" and out[3].kept
    assert out[1].cent_u == 1_000_000
    assert out[2].cent_u < 1_000_000


def test_semdedup_identical_pair_ties_to_smaller_id(spark):
    cent = _cent(spark, [("0", [1.0, 0.0])])
    df = _vecs(spark, [(10, [0.6, 0.8]), (11, [0.6, 0.8])])
    out = {r.vec_id: r.kept for r in semdedup(
        df, cent, threshold_u=950_000).collect()}
    assert out == {10: True, 11: False}


def test_semdedup_below_threshold_keeps_all(spark):
    cent = _cent(spark, [("0", [1.0, 0.0])])
    df = _vecs(spark, [(1, [1.0, 0.0]), (2, [0.8, 0.6])])  # cos = 0.8
    out = semdedup(df, cent, threshold_u=950_000)
    assert all(r.kept for r in out.collect())


def test_semdedup_overflow_rows_kept_unverified(spark, caplog):
    # 3 identical members but max_cluster_size=2: the overflow member
    # (highest id) is never pair-verified -> conservatively KEPT, and
    # the overflow is logged, never silent
    cent = _cent(spark, [("0", [1.0, 0.0])])
    df = _vecs(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])])
    import logging

    with caplog.at_level(logging.WARNING,
                         logger="rp_extract_spark.operators.similarity"):
        out = {r.vec_id: r.kept for r in semdedup(
            df, cent, threshold_u=950_000, max_cluster_size=2).collect()}
    assert out == {1: True, 2: False, 3: True}
    assert any("UNVERIFIED" in r.message for r in caplog.records)


def test_group_split_groups_are_atomic(spark):
    from rp_extract_spark.operators.curation import group_split

    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(100)], "id bigint, grp string"
    )
    out = group_split(df, "grp", fractions=(("train", 0.5), ("test", 0.5)),
                      seed=3)
    per_group = {}
    for r in out.collect():
        per_group.setdefault(r.grp, set()).add(r.split)
    assert all(len(s) == 1 for s in per_group.values())
    # both splits are non-empty over 7 groups at 50/50
    assert {s for ss in per_group.values() for s in ss} == {"train", "test"}


def test_group_split_matches_manual_md5_rule(spark):
    import hashlib

    from rp_extract_spark.operators.curation import group_split

    df = spark.createDataFrame([(i, f"g{i}") for i in range(40)],
                               "id bigint, grp string")
    out = {r.grp: r.split for r in group_split(
        df, "grp", fractions=(("train", 0.6), ("test", 0.4)), seed=11
    ).collect()}
    thr = format(int(0.6 * 16 ** 8), "08x")
    for i in range(40):
        g = f"g{i}"
        expect = ("train" if hashlib.md5(f"{g}:11".encode()).hexdigest()[:8]
                  < thr else "test")
        assert out[g] == expect, g


def test_group_split_rejects_bad_fractions(spark):
    import pytest

    from rp_extract_spark.operators.curation import group_split

    df = spark.createDataFrame([(1, "a")], "id bigint, grp string")
    with pytest.raises(ValueError):
        group_split(df, "grp", fractions=(("train", 0.5), ("test", 0.4)))


def test_group_split_near_dups_never_straddle(spark):
    """The leakage property end-to-end: every near-duplicate pair found
    by the hash dedup lands in one split when splitting by rep_id."""
    from rp_extract_spark.operators.curation import group_split
    from rp_extract_spark.operators.images import phash_dedup
    from rp_extract_spark.sources.images import near_dup_images_df

    out = group_split(
        phash_dedup(near_dup_images_df(spark, 18), hash_type="dhash",
                    max_hamming=2),
        "rep_id", fractions=(("train", 0.6), ("test", 0.4)), seed=11,
    ).collect()
    split_of = {r.image_id: r.split for r in out}
    rep_of = {r.image_id: r.rep_id for r in out}
    # fixture: images i, i+1, i+2 within each group of 3 are near-dups
    for g in range(6):
        trio = [f"img{3 * g + v:08d}" for v in range(3)]
        assert len({rep_of[t] for t in trio}) == 1
        assert len({split_of[t] for t in trio}) == 1


def test_exact_order_stats_matches_sorted_ranks(spark):
    from rp_extract_spark.operators.curation import exact_order_stats

    vals = [(i, (i * 37) % 11) for i in range(101)]  # heavy ties
    df = spark.createDataFrame(vals, "doc_id bigint, v bigint")
    ps = (0.0, 0.25, 0.5, 0.9, 1.0)
    out = {r.p: (r.k, r.value) for r in exact_order_stats(
        df, "v", ps=ps, id_col="doc_id").collect()}
    ordered = [v for _, v in sorted(vals, key=lambda t: (t[1], t[0]))]
    n = len(vals)
    for p in ps:
        k = int(p * (n - 1)) + 1
        assert out[p] == (k, ordered[k - 1]), p


def test_exact_order_stats_empty_and_validation(spark):
    import pytest

    from rp_extract_spark.operators.curation import exact_order_stats

    empty = spark.createDataFrame([], "doc_id bigint, v bigint")
    assert exact_order_stats(empty, "v").count() == 0
    df = spark.createDataFrame([(1, 2)], "doc_id bigint, v bigint")
    with pytest.raises(ValueError):
        exact_order_stats(df, "v", ps=())
    with pytest.raises(ValueError):
        exact_order_stats(df, "v", ps=(1.5,))


def test_corpus_report_levels_and_null_dim(spark):
    from rp_extract_spark.operators.curation import corpus_report

    df = spark.createDataFrame(
        [("a", "en", "web", 10), ("b", "en", "book", 20),
         ("c", None, "web", 5)],
        "doc_id string, lang string, source string, n_chars bigint",
    )
    rows = corpus_report(df).collect()
    by_key = {(r.lang, r.source): r for r in rows}
    # grand total
    g = by_key[("<all>", "<all>")]
    assert (g.n_rows, g.total_size, g.min_size, g.max_size) == (3, 35, 5, 20)
    # per-lang marginal
    assert by_key[("en", "<all>")].n_rows == 2
    # a REAL NULL dim value stays NULL — never aliased to the sentinel
    assert by_key[(None, "<all>")].n_rows == 1
    assert by_key[(None, "web")].total_size == 5
    # full cross present
    assert by_key[("en", "book")].total_size == 20


def test_kmv_distinct_exact_below_k(spark):
    from rp_extract_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [(f"v{i % 10}",) for i in range(100)], "key string")
    r = kmv_distinct(df, "key", k=64).first()
    assert (r.k_used, r.n_seen, r.est_distinct) == (64, 10, 10)


def test_kmv_distinct_matches_manual_rule_and_is_close(spark):
    import hashlib

    from rp_extract_spark.operators.sketch import kmv_distinct

    n, k = 2000, 128
    keys = [f"key{i}" for i in range(n)]
    df = spark.createDataFrame([(s,) for s in keys], "key string")
    r = kmv_distinct(df, "key", k=k).first()
    hs = sorted(
        int(hashlib.md5(f"{s}\x1ekmv".encode()).hexdigest()[:15], 16)
        for s in set(keys)
    )
    assert r.kth_hash == hs[k - 1]
    assert r.est_distinct == (k - 1) * 16 ** 15 // hs[k - 1]
    # order-statistics estimator: ~1/sqrt(k) relative error regime
    assert abs(r.est_distinct - n) / n < 0.3


def test_kmv_distinct_ignores_nulls_and_validates_k(spark):
    import pytest

    from rp_extract_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "key string")
    r = kmv_distinct(df, "key", k=8).first()
    assert r.n_seen == 2 and r.est_distinct == 2
    with pytest.raises(ValueError):
        kmv_distinct(df, "key", k=1)


def _mk_ts(s):
    import datetime

    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_interval_join_boundaries_keys_and_spanning(spark):
    from rp_extract_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [("u1", 1, _mk_ts(0)), ("u1", 2, _mk_ts(100)),
         ("u1", 3, _mk_ts(200)), ("u2", 4, _mk_ts(100)),
         ("u1", 5, _mk_ts(9000))],
        "user string, eid bigint, ts timestamp",
    )
    # w1 spans [100, 200] inclusive both ends; with bin_seconds=60 it
    # covers multiple bins; u2's row at 100 must NOT match u1's window
    ivals = spark.createDataFrame(
        [("u1", 10, _mk_ts(100), _mk_ts(200)),
         ("u2", 20, _mk_ts(0), _mk_ts(50))],
        "user string, wid bigint, start timestamp, end timestamp",
    )
    got = {(r.wid, r.eid) for r in interval_join(
        left, ivals, on=["user"], left_ts="ts", bin_seconds=60).collect()}
    assert got == {(10, 2), (10, 3)}
    # auto bin sizing gives identical matches
    auto = {(r.wid, r.eid) for r in interval_join(
        left, ivals, on=["user"], left_ts="ts").collect()}
    assert auto == got


def test_interval_join_plans_as_equi_join(spark):
    """The whole point: the inequality predicate must NOT plan as a
    nested-loop/cartesian — the bin key makes it a hashable equi join."""
    import io
    from contextlib import redirect_stdout

    from rp_extract_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [("u1", 1, _mk_ts(0))], "user string, eid bigint, ts timestamp")
    ivals = spark.createDataFrame(
        [("u1", 10, _mk_ts(0), _mk_ts(50))],
        "user string, wid bigint, start timestamp, end timestamp",
    )
    out = interval_join(left, ivals, on=["user"], left_ts="ts",
                        bin_seconds=60)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_drops_inverted_intervals(spark):
    from rp_extract_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [("u1", 1, _mk_ts(10))], "user string, eid bigint, ts timestamp")
    ivals = spark.createDataFrame(
        [("u1", 10, _mk_ts(50), _mk_ts(0))],
        "user string, wid bigint, start timestamp, end timestamp",
    )
    assert interval_join(left, ivals, on=["user"], left_ts="ts",
                         bin_seconds=60).count() == 0


def test_psi_drift_identical_corpora_near_zero(spark):
    from rp_extract_spark.operators.curation import psi_drift

    df = spark.createDataFrame(
        [(i, (i * 13) % 97) for i in range(200)], "doc_id bigint, v bigint")
    out = psi_drift(df, df, "v", n_bins=4).collect()
    assert len(out) == 4
    assert sum(r.psi_u for r in out) == 0  # identical -> every term 0
    assert sum(r.ref_n for r in out) == 200
    assert all(r.psi_u >= 0 for r in out)


def test_psi_drift_detects_shift_and_matches_manual(spark):
    import math

    from rp_extract_spark.operators.curation import psi_drift

    ref_rows = [(i, i % 100) for i in range(400)]
    cur_rows = [(i, 50 + (i % 50)) for i in range(400)]  # upper half only
    ref = spark.createDataFrame(ref_rows, "doc_id bigint, v bigint")
    cur = spark.createDataFrame(cur_rows, "doc_id bigint, v bigint")
    out = {r.bin: r for r in psi_drift(ref, cur, "v", n_bins=4).collect()}
    # manual replay
    vals = sorted((v, i) for i, v in ref_rows)
    n = len(vals)
    edges = [vals[int((i / 4) * (n - 1))][0] for i in range(1, 4)]
    def bucket(v):
        for i, e in enumerate(edges):
            if v <= e:
                return i
        return 3
    from collections import Counter

    a = Counter(bucket(v) for _, v in ref_rows)
    b = Counter(bucket(v) for _, v in cur_rows)
    na, nb = 400 + 4, 400 + 4
    total = 0
    for i in range(4):
        pa, pb = (a[i] + 1) / na, (b[i] + 1) / nb
        t = (pa - pb) * math.log(pa / pb)
        assert out[i].psi_u == int(math.floor(t * 1e6 + 0.5)), i
        assert (out[i].ref_n, out[i].cur_n) == (a[i], b[i])
        total += t
    assert total > 0.25  # a gutted lower half must read as real drift


def test_temperature_resample_exact_targets(spark):
    import math

    from rp_extract_spark.operators.curation import temperature_resample

    rows = ([(i, "big") for i in range(100)]
            + [(1000 + i, "small") for i in range(9)])
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = temperature_resample(df, "lang", "doc_id", seed=3).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    # head class unchanged: target = n_max, one copy per row
    assert len(by_lang["big"]) == 100
    assert all(r.repeats == 1 for r in by_lang["big"])
    # small class upsampled to exactly isqrt(100 * 9) = 30
    assert len(by_lang["small"]) == math.isqrt(100 * 9) == 30
    assert all(r.target == 30 for r in by_lang["small"])
    # 30 = 3*9 + 3: every row has >= 3 copies, exactly 3 rows have 4
    per_doc = {}
    for r in by_lang["small"]:
        per_doc.setdefault(r.doc_id, set()).add(r.copy_idx)
    assert sorted(len(v) for v in per_doc.values()) == [3] * 6 + [4] * 3
    # copy_idx is 1..repeats dense per doc
    for d, v in per_doc.items():
        assert v == set(range(1, len(v) + 1))


def test_temperature_resample_deterministic_and_seeded(spark):
    from rp_extract_spark.operators.curation import temperature_resample

    # b: target = isqrt(20*6) = 10 = 1*6 + 4 -> a 4-row extra-copy set
    # that the md5 permutation (hence the seed) actually selects
    rows = ([(i, "a") for i in range(20)] + [(100 + i, "b") for i in range(6)])
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    one = sorted((r.doc_id, r.copy_idx) for r in
                 temperature_resample(df, "lang", "doc_id", seed=3).collect())
    two = sorted((r.doc_id, r.copy_idx) for r in
                 temperature_resample(df, "lang", "doc_id", seed=3).collect())
    assert one == two
    other = sorted((r.doc_id, r.copy_idx) for r in
                   temperature_resample(df, "lang", "doc_id", seed=4).collect())
    # same multiset of class sizes, but a different extra-copy set
    assert len(other) == len(one)
    assert other != one


def test_skew_report_hot_keys_and_stats(spark):
    from rp_extract_spark.operators.curation import skew_report

    # key 'hog' holds 50 of 62 rows; 12 singleton keys
    rows = ([(i, "hog") for i in range(50)]
            + [(100 + i, f"k{i:02d}") for i in range(12)])
    df = spark.createDataFrame(rows, "id bigint, key string")
    out = skew_report(df, "key", top_n=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].key == "hog" and out[0].n == 50
    assert out[1].n == 1 and out[1].key == "k00"  # count ties -> key asc
    first = out[0]
    assert (first.n_keys, first.total_rows) == (13, 62)
    assert (first.p50_n, first.max_n) == (1, 50)
    # all rows carry the same globals
    assert len({(r.n_keys, r.total_rows, r.p50_n, r.p99_n, r.max_n)
                for r in out}) == 1


def test_mosaic_images_quadrant_selection(spark):
    import hashlib

    import numpy as np

    from rp_extract_spark.codecs import encode_png
    from rp_extract_spark.operators.images import (
        mosaic_geometry,
        mosaic_images,
    )

    # four congruent constant images (values 10,20,30,40) + one odd
    # leftover in a second shape class that must drop
    arrays = [np.full((8, 12), v, dtype=np.uint8) for v in (10, 20, 30, 40)]
    rows = [(f"im{i}", encode_png(a), 12, 8, "png")
            for i, a in enumerate(arrays)]
    rows.append(("odd", encode_png(np.zeros((4, 4), np.uint8)), 4, 4, "png"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    out = mosaic_images(df, seed=5, epoch=2).collect()
    assert len(out) == 1  # one quad; the odd class has no full quad
    r = out[0]
    assert r.err is None
    ids = [r.a_id, r.b_id, r.c_id, r.d_id]
    assert sorted(ids) == ["im0", "im1", "im2", "im3"]
    k = hashlib.md5(":".join(ids + ["5", "2"]).encode()).hexdigest()
    cx, cy = mosaic_geometry(12, 8, int(k[0], 16), int(k[1], 16))
    assert (r.cx, r.cy) == (cx, cy)
    vals = {f"im{i}": v for i, v in enumerate((10, 20, 30, 40))}
    va, vb, vc, vd = (vals[x] for x in ids)
    m0 = (va * cx * cy + vb * (12 - cx) * cy
          + vc * cx * (8 - cy) + vd * (12 - cx) * (8 - cy))
    assert r.m0 == m0


def test_mae_mask_exact_count_and_witness(spark):
    import hashlib

    import numpy as np

    from rp_extract_spark.codecs import encode_png
    from rp_extract_spark.operators.images import mae_mask

    # 32x48 -> 2x3 = 6 patches of 16x16; distinct constant per patch
    a = np.zeros((32, 48), dtype=np.uint8)
    for py in range(2):
        for px_ in range(3):
            a[py * 16:(py + 1) * 16, px_ * 16:(px_ + 1) * 16] = (
                10 + py * 3 + px_)
    df = spark.createDataFrame(
        [("im0", encode_png(a), 48, 32, "png")],
        "image_id string, bytes binary, w int, h int, fmt string")
    r = mae_mask(df, patch=16, mask_num=3, mask_den=4, seed=2,
                 epoch=0).first()
    assert (r.n_patches, r.n_masked) == (6, 4)
    sums = [(10 + j) * 256 for j in range(6)]  # pidx = py*3+px
    order = sorted(range(6), key=lambda j: (
        hashlib.md5(f"im0:2:0:{j}".encode()).hexdigest(), j))
    masked = set(order[:4])
    assert r.masked_sum == sum(sums[j] for j in masked)
    assert r.visible_sum == sum(sums[j] for j in range(6) if j not in masked)
    assert r.err is None


def test_mae_mask_small_image_quarantines(spark):
    import numpy as np

    from rp_extract_spark.codecs import encode_png
    from rp_extract_spark.operators.images import mae_mask

    df = spark.createDataFrame(
        [("tiny", encode_png(np.zeros((8, 8), np.uint8)), 8, 8, "png")],
        "image_id string, bytes binary, w int, h int, fmt string")
    r = mae_mask(df, patch=16).first()
    assert r.err is not None and r.n_patches is None


def test_incremental_dedup_both_paths(spark):
    from rp_extract_spark.operators.dedup import hamming64_dedup_incremental

    # index: two reps far apart; batch: one near-dup of idx0 (1 bit),
    # one exact dup of idx1, one fresh pair (mutual dups, no index hit)
    idx = spark.createDataFrame(
        [("i0", 0), ("i1", 0x7FFF0000FFFF0000)], "id string, h long")
    new = spark.createDataFrame(
        [("n0", 1),                      # hamming 1 from i0
         ("n1", 0x7FFF0000FFFF0000),     # exact i1
         ("n2", 0x0F0F0F0F0F0F0F0F),    # fresh pair with n3
         ("n3", 0x0F0F0F0F0F0F0F0E)],
        "id string, h long")
    out = {r.id: (r.rep_id, r.status) for r in
           hamming64_dedup_incremental(new, idx, "h", "id", 2).collect()}
    assert out["n0"] == ("i0", "dup_of_index")
    assert out["n1"] == ("i1", "dup_of_index")
    assert out["n2"] == ("n2", "fresh_rep")
    assert out["n3"] == ("n2", "dup_in_batch")


def test_incremental_dedup_one_hop_semantics(spark):
    """A chain new2 ~ new1 ~ index where new2 misses the index keeps
    new2 in the batch component — the documented one-hop trade."""
    from rp_extract_spark.operators.dedup import hamming64_dedup_incremental

    idx = spark.createDataFrame([("i0", 0)], "id string, h long")
    new = spark.createDataFrame(
        [("n1", 3),    # hamming 2 from i0 -> matches index
         ("n2", 15)],  # hamming 2 from n1, hamming 4 from i0
        "id string, h long")
    out = {r.id: (r.rep_id, r.status) for r in
           hamming64_dedup_incremental(new, idx, "h", "id", 2).collect()}
    assert out["n1"] == ("i0", "dup_of_index")
    assert out["n2"] == ("n2", "fresh_rep")


def test_span_corruption_exact_counts_and_witness(spark):
    import hashlib

    from rp_extract_spark.operators.text import span_corruption_plan

    # 21 tokens -> 7 blocks of 3; (7*15)//100 = 1 masked block
    words = [f"w{j:02d}" + "x" * (j % 4) for j in range(21)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "   ")],  # doc 2: zero tokens, no row
        "doc_id bigint, text string")
    out = span_corruption_plan(df, "text", "doc_id", span=3,
                               mask_num=15, mask_den=100, seed=9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_tokens, r.n_blocks, r.n_masked_blocks) == (21, 7, 1)
    blocks = [words[3 * b:3 * b + 3] for b in range(7)]
    order = sorted(range(7), key=lambda b: (
        hashlib.md5(f"1:{b}:9".encode()).hexdigest(), b))
    masked = order[0]
    mchars = sum(len(w) for w in blocks[masked])
    assert r.masked_chars == mchars
    assert r.visible_chars == sum(len(w) for w in words) - mchars


def test_bloom_no_false_negatives_and_manual_positions(spark):
    import hashlib

    from rp_extract_spark.operators.sketch import bloom_build, bloom_probe

    members = [f"key{i}" for i in range(30)]
    others = [f"other{i}" for i in range(200)]
    mdf = spark.createDataFrame([(s,) for s in members], "k string")
    adf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(members + others)],
        "id bigint, k string")
    bloom = bloom_build(mdf, "k", m_bits=128, k=3)
    # manual position replay
    def pos(s, j):
        return int(hashlib.md5(
            f"{s}\x1ebloom{j}".encode()).hexdigest()[:8], 16) % 128
    expect_bits = {pos(s, j) for s in members for j in range(3)}
    assert {r.pos for r in bloom.collect()} == expect_bits
    out = {r.id: r.maybe_member for r in bloom_probe(
        adf, bloom, "k", m_bits=128, k=3).collect()}
    # no false negatives ever
    assert all(out[i] == 1 for i in range(len(members)))
    # small m forces some false positives; all flagged non-members
    # must have all 3 positions set (replay the definition)
    fps = [i for i in range(len(members), len(members) + len(others))
           if out[i] == 1]
    assert fps, "fixture should produce false positives at m=128"
    for i in fps:
        s = (members + others)[i]
        assert all(pos(s, j) in expect_bits for j in range(3))


def test_bloom_validates_params(spark):
    import pytest

    from rp_extract_spark.operators.sketch import bloom_build

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        bloom_build(df, "k", m_bits=0)


def test_zorder_key_known_curve_and_locality(spark):
    from pyspark.sql import functions as F

    from rp_extract_spark.sources.feature_store import zorder_key

    grid = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int")
    out = {(r.x, r.y): r.z for r in grid.withColumn(
        "z", zorder_key(F.col("x"), F.col("y"), bits=2)).collect()}
    # the canonical 4x4 Morton curve
    expect = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
              (2, 0): 4, (3, 0): 5, (2, 1): 6, (3, 1): 7,
              (0, 2): 8, (1, 2): 9, (0, 3): 10, (1, 3): 11,
              (2, 2): 12, (3, 2): 13, (2, 3): 14, (3, 3): 15}
    assert out == expect
    # clamping saturates, never wraps
    big = spark.createDataFrame([(99, -5)], "x int, y int")
    r = big.withColumn("z", zorder_key(F.col("x"), F.col("y"),
                                       bits=2)).first()
    assert r.z == out[(3, 0)]


def test_ivf_stored_probe_partition_prunes(spark, tmp_path):
    """The serve-layout claim made real: probing the written IVF table
    must push the list_id filter into PartitionFilters (scan touches
    only the probed lists' directories) and return the same top-k as
    the in-memory probe."""
    import io
    import os
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from rp_extract_spark.operators.similarity import (
        ivf_build,
        ivf_probe,
        ivf_probe_stored,
        ivf_write,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("string").alias("centroid_label"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    qv = [float(x) for x in e.filter(F.col("vec_id") == 3).first().embedding]
    lists = ivf_build(e, cent)
    out = str(tmp_path / "ivf")
    ivf_write(lists, out)
    assert any(d.startswith("list_id=") for d in os.listdir(out))
    stored = ivf_probe_stored(spark, out, cent, qv, k=5, nprobe=2)
    mem = ivf_probe(lists, cent, qv, k=5, nprobe=2)
    got = [(r.vec_id, round(r.score, 9)) for r in stored.collect()]
    exp = [(r.vec_id, round(r.score, 9)) for r in mem.collect()]
    assert got == exp
    buf = io.StringIO()
    with redirect_stdout(buf):
        stored.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "list_id" in plan
    # the pruning is real: the filter must appear inside
    # PartitionFilters (not just PushedFilters on a data column)
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("list_id" in ln for ln in pf_lines)


def test_stream_drift_counts_matches_batch_binning(spark, tmp_path):
    """The streaming drift monitor's bucket counts must equal the
    batch recompute over the same fixed reference edges."""
    from datetime import datetime, timedelta

    from rp_extract_spark.streaming.extract_stream import stream_drift_counts

    base = datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append((base + timedelta(minutes=i), float(i % 10)))
    for i in range(20):  # second hour: shifted distribution
        rows.append((base + timedelta(hours=1, minutes=i), float(5 + i % 5)))
    src = str(tmp_path / "vals")
    spark.createDataFrame(rows, "ts timestamp, value double").write.parquet(
        src)
    edges = [2.0, 5.0, 7.0]
    stream = spark.readStream.schema("ts timestamp, value double").parquet(
        src)
    agg = stream_drift_counts(stream, edges, bucket="1 hour")
    q = (agg.writeStream.format("memory").queryName("drift")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.bucket, r.bin): r.n for r in spark.table("drift").collect()}

    def bucket_of(v):
        for i, e in enumerate(edges):
            if v <= e:
                return i
        return len(edges)
    from collections import Counter

    exp = Counter()
    for ts, v in rows:
        exp[(base if ts < base + timedelta(hours=1)
             else base + timedelta(hours=1), bucket_of(v))] += 1
    assert got == dict(exp)
    # the shifted second hour has no rows below the first edge
    assert (base + timedelta(hours=1), 0) not in got


def test_group_split_zero_weight_tail(spark):
    """cum=1.0 mid-list must not break the fixed-width hex compare: a
    zero-weight tail split gets nothing, the last weighted split gets
    every remaining row."""
    from rp_extract_spark.operators.curation import group_split

    df = spark.createDataFrame([(i, f"g{i}") for i in range(64)],
                               "id bigint, grp string")
    out = group_split(
        df, "grp",
        fractions=(("train", 0.5), ("val", 0.5), ("test", 0.0)), seed=3)
    counts = {r.split: 1 for r in out.collect()}
    by = {}
    for r in out.collect():
        by[r.split] = by.get(r.split, 0) + 1
    assert by.get("test", 0) == 0
    assert by.get("train", 0) + by.get("val", 0) == 64
    assert by.get("val", 0) > 10  # ~half, not the ~1/16 bug regime


def test_exact_order_stats_ignores_nulls(spark):
    from rp_extract_spark.operators.curation import exact_order_stats

    df = spark.createDataFrame(
        [(1, None), (2, 10), (3, 20), (4, None), (5, 30)],
        "doc_id bigint, v bigint")
    out = {r.p: r.value for r in exact_order_stats(
        df, "v", ps=(0.0, 1.0)).collect()}
    assert out == {0.0: 10, 1.0: 30}


def test_snapshot_diff_refuses_after_later_overwrite(spark, tmp_path):
    import pytest as _pytest

    from rp_extract_spark.operators.resume import snapshot_diff, write_snapshot

    out = str(tmp_path / "cdc2")
    m1 = write_snapshot(spark.createDataFrame([(1,)], "image_id long"),
                        out, ts_col=None)
    m2 = write_snapshot(spark.createDataFrame([(2,)], "image_id long"),
                        out, ts_col=None)
    write_snapshot(spark.createDataFrame([(9,)], "image_id long"), out,
                   mode="overwrite", ts_col=None)
    # both endpoints predate the rewrite: their files are gone
    with _pytest.raises(ValueError, match="invalidated"):
        snapshot_diff(spark, out, m1["snapshot_id"], m2["snapshot_id"])


def test_bloom_probe_zero_shuffle_plan(spark):
    """The probe must be one codegen projection — no Exchange anywhere
    (the join-the-position-table formulation would shuffle the corpus
    on the group-back)."""
    import io
    from contextlib import redirect_stdout

    from rp_extract_spark.operators.sketch import bloom_build, bloom_probe

    mdf = spark.createDataFrame([(f"m{i}",) for i in range(10)], "k string")
    adf = spark.createDataFrame([(i, f"m{i}") for i in range(50)],
                                "id bigint, k string")
    bloom = bloom_build(mdf, "k", m_bits=128, k=3)
    out = bloom_probe(adf, bloom, "k", m_bits=128, k=3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_bloom_null_keys_build_and_probe(spark):
    """NULL keys: excluded from the build (no NULL position rows),
    probed as maybe_member=0 — never NULL, never a crash."""
    from rp_extract_spark.operators.sketch import bloom_build, bloom_probe

    mdf = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    bloom = bloom_build(mdf, "k", m_bits=64, k=2)
    assert all(r.pos is not None for r in bloom.collect())
    adf = spark.createDataFrame([(1, "a"), (2, None), (3, "zzz")],
                                "id bigint, k string")
    out = {r.id: r.maybe_member for r in bloom_probe(
        adf, bloom, "k", m_bits=64, k=2).collect()}
    assert out[1] == 1 and out[2] == 0
    assert out[3] in (0, 1)  # tiny m may false-positive, never NULL


def test_verify_webdataset_multifield_and_block_boundary_tear(spark,
                                                              tmp_path):
    """Multi-field samples (key.png + key.json) count as ONE sample
    and are not 'duplicates'; a truncation at a 512-byte block
    boundary — which parses as a valid shorter tar — still fails via
    the end-of-archive marker check, manifest or not."""
    import os

    from rp_extract_spark.sources.images import images_df
    from rp_extract_spark.sources.webdataset import (
        verify_webdataset,
        write_webdataset,
    )

    out = str(tmp_path / "wds_mf")
    imgs = images_df(spark, 6, seed=7).repartition(1)
    write_webdataset(imgs, out, meta_cols=("w", "h"),
                     shard_rows=6).collect()
    rows = verify_webdataset(spark, out + "/*.tar").collect()
    assert len(rows) == 1 and rows[0].ok == 1
    assert rows[0].n_samples == 6  # 12 members (png + json) = 6 samples
    assert rows[0].n_members == 12

    # cut EXACTLY at the last member's end — a 512-block boundary, so
    # the tar still parses (as a shorter archive once whole members
    # are dropped; here all members survive but the end-of-archive
    # marker is gone). tarfile pads archives to 10240-byte records,
    # so naive "len - 1536" cuts only remove padding.
    import io as _io
    import tarfile as _tarfile

    shard = os.path.join(out, sorted(os.listdir(out))[0])
    data = open(shard, "rb").read()
    with _tarfile.open(fileobj=_io.BytesIO(data)) as tf:
        end = max(m.offset_data + ((m.size + 511) // 512) * 512
                  for m in tf.getmembers())
    open(shard, "wb").write(data[:end])
    bad = verify_webdataset(spark, out + "/*.tar").collect()
    assert bad[0].ok == 0
    assert "torn" in bad[0].err or "marker" in bad[0].err


def test_mix_schedule_smooth_pacing(spark):
    """Stride scheduling's defining property: in every prefix, each
    source's share deviates from its target by less than one step."""
    from rp_extract_spark.operators.curation import mix_schedule

    w = spark.createDataFrame(
        [("a", 6), ("b", 3), ("c", 1)], "source string, weight int")
    out = mix_schedule(w).collect()
    assert len(out) == 10
    assert [r.step for r in out] == list(range(1, 11))
    from collections import Counter

    totals = {"a": 6, "b": 3, "c": 1}
    seen = Counter()
    for r in out:
        seen[r.source] += 1
        for s, tot in totals.items():
            target = tot * r.step / 10
            assert abs(seen[s] - target) < 1.0 + 1e-9, (r.step, s)
    assert seen == Counter(totals)
    # deterministic re-run
    again = [(r.step, r.source) for r in mix_schedule(w).collect()]
    assert again == [(r.step, r.source) for r in out]


def test_mix_schedule_validates(spark):
    import pytest

    from rp_extract_spark.operators.curation import mix_schedule

    bad = spark.createDataFrame([("a", 0)], "source string, weight int")
    with pytest.raises(ValueError):
        mix_schedule(bad)
    empty = spark.createDataFrame([], "source string, weight int")
    with pytest.raises(ValueError):
        mix_schedule(empty)


def test_retrieval_recall_hand_fixture(spark):
    from rp_extract_spark.operators.similarity import retrieval_recall

    # gallery on unit axes; q0 -> g0 exactly (rank 1), q1 sits between
    # g1 and g2 but closer to g2 -> its positive g1 ranks 2
    gallery = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
         (2, [0.0, 0.0, 1.0])], "vec_id bigint, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.4, 0.9])],
        "q_id bigint, embedding array<double>")
    positives = spark.createDataFrame(
        [(0, 0), (1, 1)], "q_id bigint, vec_id bigint")
    out = {r.k: (r.n_hits, r.recall_u) for r in retrieval_recall(
        queries, gallery, positives, ks=(1, 2)).collect()}
    assert out[1] == (1, 500_000)
    assert out[2] == (2, 1_000_000)


def test_retrieval_recall_validates_ks(spark):
    import pytest

    from rp_extract_spark.operators.similarity import retrieval_recall

    df = spark.createDataFrame([(0, [1.0])],
                               "vec_id bigint, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0])],
                              "q_id bigint, embedding array<double>")
    p = spark.createDataFrame([(0, 0)], "q_id bigint, vec_id bigint")
    with pytest.raises(ValueError):
        retrieval_recall(q, df, p, ks=())
    with pytest.raises(ValueError):
        retrieval_recall(q, df, p, ks=(0,))
