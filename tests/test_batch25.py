"""Twenty-fifth-batch operators: exact-substring dedup (ExactSubstr),
D4-orbit-canonical dHash dedup, crowd majority vote, video frame
near-dup thinning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.codecs.avi import encode_mjpeg_avi
from rp_extract_spark.operators.classify import majority_vote
from rp_extract_spark.operators.dedup import dedup_substrings
from rp_extract_spark.operators.images import (
    dhash64,
    orbit_dedup,
    orbit_dhash64,
    transform_images,
)
from rp_extract_spark.operators.multimodal import dedup_frames


# ------------------------------------------------- dedup_substrings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_dedup_removes_later_occurrence(spark):
    shared = "a b c d e f g h"  # exactly one 8-gram
    rows = [
        (1, shared + " x y"),
        (2, "p q " + shared),
        (3, "u v w only unique tokens here now"),
    ]
    out = dedup_substrings(_docs(spark, rows), n=8)
    got = {r["doc_id"]: r for r in out.collect()}
    # doc 1 is the (id, pos) winner: untouched
    assert got[1]["clean_text"] == shared + " x y"
    assert got[1]["n_removed"] == 0
    # doc 2 loses the 8 shared tokens, keeps its prefix
    assert got[2]["clean_text"] == "p q"
    assert got[2]["n_removed"] == 8
    # unique doc untouched
    assert got[3]["n_removed"] == 0
    assert got[3]["clean_text"] == rows[2][1]


def test_substring_dedup_exact_dup_doc_empties(spark):
    text = " ".join(f"t{i}" for i in range(12))
    out = dedup_substrings(_docs(spark, [(1, text), (2, text)]), n=8)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["clean_text"] == text
    # every token of doc 2 is covered by some duplicated 8-gram
    assert got[2]["clean_text"] == ""
    assert got[2]["n_removed"] == 12


def test_substring_dedup_overlapping_spans_union(spark):
    # doc 2 repeats a 9-token run -> two overlapping dup 8-grams;
    # removal positions must union, not double-count
    run = "a b c d e f g h i"
    out = dedup_substrings(
        _docs(spark, [(1, run + " z"), (2, "k " + run)]), n=8
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[2]["clean_text"] == "k"
    assert got[2]["n_removed"] == 9


def test_substring_dedup_short_doc_untouched(spark):
    out = dedup_substrings(
        _docs(spark, [(1, "a b c"), (2, "a b c")]), n=8
    )
    for r in out.collect():
        assert r["n_removed"] == 0
        assert r["clean_text"] == "a b c"


# ------------------------------------------------- orbit dedup


def test_orbit_dhash_invariant_under_d4():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    base = orbit_dhash64(px)
    for k in range(4):
        assert orbit_dhash64(np.rot90(px, k)) == base
        assert orbit_dhash64(np.rot90(px[:, ::-1], k)) == base
    # plain dhash is NOT invariant for this image (sanity: the orbit
    # min is doing real work)
    assert dhash64(px) != dhash64(px[:, ::-1])


def test_orbit_dedup_groups_copies(spark):
    from rp_extract_spark.sources.images import formula_images_df

    base = formula_images_df(spark, 6).select("image_id", "bytes", "fmt")
    rot = transform_images(base, "rot90").select(
        F.concat("image_id", F.lit("_r")).alias("image_id"), "bytes", "fmt"
    )
    out = orbit_dedup(base.unionByName(rot))
    rows = {r["image_id"]: r for r in out.collect()}
    assert len(rows) == 12
    for i in range(6):
        b = rows[f"img{i:08d}"]
        c = rows[f"img{i:08d}_r"]
        # group closure: the rotated copy lands on the same canonical
        # hash, so it groups with (at least) its base
        assert c["obits"] == b["obits"]
        assert c["is_dup"]
        assert b["keeper_id"] == c["keeper_id"]


# ------------------------------------------------- majority_vote


def test_majority_vote_argmax_and_ties(spark):
    rows = (
        [(1, 2)] * 2 + [(1, 3)]          # item 1: 2 wins 2-1
        + [(2, 1)] * 2 + [(2, 2)] * 2    # item 2: tie -> smallest label
        + [(3, 9)]                        # item 3: single vote
    )
    df = spark.createDataFrame(rows, "item_id long, label int")
    got = {r["item_id"]: r for r in majority_vote(df).collect()}
    assert (got[1]["maj_label"], got[1]["maj_votes"],
            got[1]["second_votes"], got[1]["total_votes"]) == (2, 2, 1, 3)
    assert (got[2]["maj_label"], got[2]["maj_votes"],
            got[2]["second_votes"]) == (1, 2, 2)
    assert (got[3]["maj_label"], got[3]["maj_votes"],
            got[3]["second_votes"], got[3]["total_votes"]) == (9, 1, 0, 1)


# ------------------------------------------------- dedup_frames


def _videos(spark, specs):
    import pandas as pd

    def gen(batches):
        for b in batches:
            vids, blobs = [], []
            for i in b["id"].values:
                vid, vals = specs[int(i)]
                frames = [
                    np.full((16, 16), v, dtype=np.uint8) for v in vals
                ]
                vids.append(vid)
                blobs.append(encode_mjpeg_avi(frames, fps=10))
            yield pd.DataFrame({"video_id": vids, "bytes": blobs})

    return spark.range(len(specs)).mapInPandas(
        gen, "video_id string, bytes binary"
    )


def test_dedup_frames_thresholds(spark):
    vids = _videos(
        spark,
        [
            ("a", [10, 10, 50, 50, 51]),  # dup pair, change, dup, +1
            ("b", [200]),                 # single frame
        ],
    )
    out = dedup_frames(vids, every_n=1, grid=8, thr=100)
    rows = {(r["video_id"], r["frame_idx"]): r for r in out.collect()}
    assert rows[("a", 0)]["keep"] and rows[("a", 0)]["grid_sse"] is None
    assert not rows[("a", 1)]["keep"] and rows[("a", 1)]["grid_sse"] == 0
    assert rows[("a", 2)]["keep"] and rows[("a", 2)]["grid_sse"] == 64 * 40 * 40
    assert not rows[("a", 3)]["keep"]
    # +1 change -> sse 64 <= thr: dropped
    assert not rows[("a", 4)]["keep"] and rows[("a", 4)]["grid_sse"] == 64
    assert rows[("b", 0)]["keep"]
