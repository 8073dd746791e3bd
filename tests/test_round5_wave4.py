"""Round-5 fourth-wave data-loader operators: corpus normalization
stats, bucketed batch packing, per-epoch hash-decided augmentation,
deterministic mixup.

Expectations are straight-line hand computations on decoded fixture
pixels (numpy sums/moments, manual md5 ranks) — never the operator's
own helpers.
"""

import hashlib

import numpy as np
import pytest

from rp_extract_spark.codecs import decode_image, encode_png
from rp_extract_spark.operators.curation import pack_batches
from rp_extract_spark.operators.images import (
    augment_moments,
    corpus_pixel_stats,
    mixup_images,
    plan_epoch_augment,
)
from rp_extract_spark.sources.images import formula_images_df


def _img_df(spark, arrays):
    rows = [
        (f"im{i:04d}", encode_png(a), a.shape[1], a.shape[0], "png")
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _md5key(iid, seed, epoch):
    return hashlib.md5(f"{iid}:{seed}:{epoch}".encode()).hexdigest()


# ------------------------------------------------- corpus_pixel_stats


def test_corpus_pixel_stats_exact(spark):
    rng = np.random.default_rng(7)
    arrays = [
        rng.integers(0, 256, (12, 9), dtype=np.uint8) for _ in range(5)
    ]
    row = corpus_pixel_stats(_img_df(spark, arrays)).collect()[0]
    flat = np.concatenate([a.ravel().astype(np.int64) for a in arrays])
    assert row["n_images"] == 5
    assert row["n_px"] == flat.size
    assert row["px_sum"] == int(flat.sum())
    assert row["px_sq_sum"] == int((flat * flat).sum())
    assert row["px_min"] == int(flat.min())
    assert row["px_max"] == int(flat.max())
    mean = int(flat.sum()) / flat.size
    var = int((flat * flat).sum()) / flat.size - mean * mean
    assert row["mean"] == mean
    assert row["std"] == np.sqrt(var)


def test_corpus_pixel_stats_skips_quarantined(spark):
    arrays = [np.full((4, 4), 10, dtype=np.uint8)]
    good = _img_df(spark, arrays)
    bad = spark.createDataFrame(
        [("bad", b"not a png", 4, 4, "png")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    row = corpus_pixel_stats(good.unionByName(bad)).collect()[0]
    assert row["n_images"] == 1
    assert row["px_sum"] == 160


# ------------------------------------------------------ pack_batches


def _ranks(ids, seed, epoch):
    return sorted(ids, key=lambda i: (_md5key(i, seed, epoch), i))


def test_pack_batches_matches_manual_md5_order(spark):
    df = spark.createDataFrame(
        [(f"d{i:02d}", i % 2) for i in range(11)], "id string, bk int"
    )
    out = pack_batches(
        df, bucket_cols=("bk",), id_col="id", batch_size=2, seed=3, epoch=1
    ).collect()
    got = {r["id"]: (r["bk"], r["batch_idx"], r["slot"]) for r in out}
    for bk in (0, 1):
        ids = [f"d{i:02d}" for i in range(11) if i % 2 == bk]
        order = _ranks(ids, 3, 1)
        keep = (len(order) // 2) * 2
        for pos, iid in enumerate(order):
            if pos < keep:
                assert got[iid] == (bk, pos // 2, pos % 2)
            else:
                assert iid not in got  # partial batch dropped
    assert len(got) == sum((len([i for i in range(11) if i % 2 == b]) // 2) * 2
                           for b in (0, 1))


def test_pack_batches_keep_partial_and_epoch_changes_permutation(spark):
    df = spark.createDataFrame(
        [(f"d{i}", 0) for i in range(7)], "id string, bk int"
    )
    full = pack_batches(
        df, ("bk",), "id", batch_size=4, seed=0, epoch=0, drop_partial=False
    ).collect()
    assert len(full) == 7
    assert sorted((r["batch_idx"], r["slot"]) for r in full) == [
        (0, 0), (0, 1), (0, 2), (0, 3), (1, 0), (1, 1), (1, 2)
    ]
    e0 = {r["id"]: (r["batch_idx"], r["slot"]) for r in full}
    e1 = {
        r["id"]: (r["batch_idx"], r["slot"])
        for r in pack_batches(
            df, ("bk",), "id", batch_size=4, seed=0, epoch=1,
            drop_partial=False,
        ).collect()
    }
    assert e0 != e1  # a new permutation per epoch


# -------------------------------------------------- augment plan/apply


def test_plan_epoch_augment_matches_md5_digits(spark):
    arrays = [np.zeros((2, 2), dtype=np.uint8) for _ in range(6)]
    out = plan_epoch_augment(_img_df(spark, arrays), seed=4, epoch=9)
    for r in out.select("image_id", "flip_h", "rot180").collect():
        k = _md5key(r["image_id"], 4, 9)
        assert r["flip_h"] == int(k[0], 16) % 2
        assert r["rot180"] == int(k[1], 16) % 2


def _moments(px):
    px = px.astype(np.int64)
    h, w = px.shape
    return (
        int(px.sum()),
        int((px.sum(axis=0) * np.arange(w)).sum()),
        int((px.sum(axis=1) * np.arange(h)).sum()),
    )


def test_augment_moments_witness_geometry(spark):
    rng = np.random.default_rng(1)
    arrays = [rng.integers(0, 256, (5, 8), dtype=np.uint8) for _ in range(8)]
    out = augment_moments(_img_df(spark, arrays), seed=2, epoch=3).collect()
    assert all(r["err"] is None for r in out)
    seen_flip = set()
    for r in out:
        i = int(r["image_id"][2:])
        px = arrays[i]
        if r["flip_h"]:
            px = px[:, ::-1]
        if r["rot180"]:
            px = np.rot90(px, 2)
        assert (r["m0"], r["mx"], r["my"]) == _moments(px)
        assert (r["w"], r["h"]) == (8, 5)
        seen_flip.add((r["flip_h"], r["rot180"]))
        # m0 invariant, mx/my witness position changes
        assert r["m0"] == int(arrays[i].astype(np.int64).sum())
    assert len(seen_flip) > 1  # the hash actually varies decisions


def test_augment_moments_error_isolated(spark):
    good = _img_df(spark, [np.full((3, 3), 5, dtype=np.uint8)])
    bad = spark.createDataFrame(
        [("bad", b"xx", 3, 3, "png")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {r["image_id"]: r for r in
            augment_moments(good.unionByName(bad)).collect()}
    assert rows["im0000"]["err"] is None
    assert rows["bad"]["err"] is not None and rows["bad"]["m0"] is None


# ------------------------------------------------------------- mixup


def test_mixup_pairs_blend_exact(spark):
    rng = np.random.default_rng(9)
    # two shape classes: 4 of (6x4), 3 of (3x5) -> 2 pairs + 1 pair,
    # one leftover dropped per odd class
    arrays = [rng.integers(0, 256, (6, 4), dtype=np.uint8) for _ in range(4)]
    arrays += [rng.integers(0, 256, (3, 5), dtype=np.uint8) for _ in range(3)]
    df = _img_df(spark, arrays)
    out = mixup_images(df, seed=5, epoch=1).collect()
    assert len(out) == 3
    assert all(r["err"] is None for r in out)
    px_by_id = {f"im{i:04d}": a for i, a in enumerate(arrays)}
    for r in out:
        pa = px_by_id[r["a_id"]].astype(np.int64)
        pb = px_by_id[r["b_id"]].astype(np.int64)
        assert pa.shape == pb.shape == (r["h"], r["w"])
        assert (r["m0"], r["mx"], r["my"]) == _moments((pa + pb) // 2)
    # pairing follows the md5 order within each shape class
    for shape, ids in ((
        (6, 4), [f"im{i:04d}" for i in range(4)]), (
        (3, 5), [f"im{i:04d}" for i in range(4, 7)])):
        order = _ranks(ids, 5, 1)
        expected = [(order[0], order[1])]
        if len(order) >= 4:
            expected.append((order[2], order[3]))
        got = sorted(
            (r["a_id"], r["b_id"]) for r in out
            if (r["h"], r["w"]) == shape
        )
        assert got == sorted(expected)


def test_mixup_on_formula_images_every_pair_same_dims(spark):
    df = formula_images_df(spark, 24)
    out = mixup_images(df, seed=0, epoch=0).collect()
    assert out and all(r["err"] is None for r in out)
    assert all(r["a_id"] != r["b_id"] for r in out)
    ids = [x for r in out for x in (r["a_id"], r["b_id"])]
    assert len(ids) == len(set(ids))  # each image used at most once
