"""File sources/sinks, multimodal operators, embedding dedup, BPM."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rp_extract_spark.codecs import decode_png, encode_png
from rp_extract_spark.functions.kernel import MOD_FREQ_RES, peak_modulation_bpm
from rp_extract_spark.operators.dedup import embedding_cosine_dedup
from rp_extract_spark.operators.multimodal import (
    analyze_audio,
    block_mean_resize,
    fake_video_bytes,
    resize_images,
    sample_video_frames,
)
from rp_extract_spark.sources.files import (
    read_class_file,
    read_csv_features,
    read_file_list,
    scan_image_dir,
    write_class_file,
    write_csv_features,
)
from rp_extract_spark.sources.images import images_df

rng = np.random.default_rng(21)


def test_scan_image_dir(spark, tmp_path):
    d = tmp_path / "imgs"
    (d / "sub").mkdir(parents=True)
    for name in ["a.png", "sub/b.PNG", ".hidden.png", "c.txt"]:
        px = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        (d / name).write_bytes(encode_png(px))
    (d / "empty.png").write_bytes(b"")
    out = scan_image_dir(spark, str(d)).collect()
    ids = sorted(r.image_id for r in out)
    assert ids == ["a", "b"]  # hidden, wrong-ext and 0-byte filtered
    assert all(r.fmt == "png" for r in out)


def test_file_list_and_class_file_roundtrip(spark, tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text("a.png\n\n b.png \n")
    got = [r.path for r in read_file_list(spark, str(lst)).orderBy("path").collect()]
    assert got == ["a.png", "b.png"]

    labels = spark.createDataFrame(
        [("x", "rock"), ("y", "jazz")], "id string, label string"
    )
    out = str(tmp_path / "cls")
    write_class_file(labels, out)
    back = {r.id: r.label for r in read_class_file(spark, out).collect()}
    assert back == {"x": "rock", "y": "jazz"}


def test_csv_features_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", [1.0, 2.5, 3.0]), ("b", [4.0, 5.0, 6.5])],
        "image_id string, vec array<double>",
    )
    out = str(tmp_path / "feat_csv")
    write_csv_features(df, out, "vec")
    back = {r.id: list(r.vec) for r in read_csv_features(spark, out).collect()}
    assert back == {"a": [1.0, 2.5, 3.0], "b": [4.0, 5.0, 6.5]}
    ids = read_csv_features(spark, out, ids_only=True)
    assert sorted(r.id for r in ids.collect()) == ["a", "b"]
    assert ids.columns == ["id"]


def test_resize_images(spark):
    imgs = images_df(spark, 8, seed=42)
    out = resize_images(imgs, out_h=16, out_w=16).collect()
    assert len(out) == 8
    for r in out:
        assert r.err is None
        px = decode_png(bytes(r.bytes))
        assert px.shape == (16, 16)


def test_block_mean_resize_exact():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = block_mean_resize(px, 2, 2)
    assert small.shape == (2, 2)


def test_audio_stub_quarantines(spark):
    clips = spark.createDataFrame(
        [("c1", b"\x00\x01"), ("c2", b"\x02")], "clip_id string, bytes binary"
    )
    rows = analyze_audio(clips).collect()
    assert len(rows) == 2
    assert all(r.err is not None and "NotImplementedError" in r.err for r in rows)


def test_video_frame_sampling(spark):
    frames = [rng.integers(0, 256, (8, 8), dtype=np.uint8) for _ in range(10)]
    vids = spark.createDataFrame(
        [("v1", fake_video_bytes(frames)), ("v2", b"not a video")],
        "video_id string, bytes binary",
    )
    rows = sample_video_frames(vids, every_n=4).collect()
    good = [r for r in rows if r.video_id == "v1"]
    bad = [r for r in rows if r.video_id == "v2"]
    assert sorted(r.frame_idx for r in good) == [0, 4, 8]
    px = decode_png(bytes(good[0].frame_bytes))
    assert px.shape == (8, 8)
    assert len(bad) == 1 and "NotImplementedError" in bad[0].err


def test_embedding_cosine_dedup(spark):
    base = rng.normal(size=(20, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i < 4:  # near-duplicates: tiny perturbation, same direction
            rows.append((100 + i, [float(x) for x in v * 1.001]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rep = {r.vec_id: r.rep_id for r in embedding_cosine_dedup(
        emb, threshold=0.999, n_planes=6).collect()}
    assert len(rep) == len(rows)
    for i in range(4):
        assert rep[100 + i] == i  # copies collapse onto originals
    # distinct random gaussians (cos ~ 0) stay their own rep
    self_reps = sum(1 for i in range(20) if rep[i] == i)
    assert self_reps == 20


def test_peak_modulation_bpm():
    rh = np.zeros(60)
    rh[11] = 3.0
    assert abs(peak_modulation_bpm(rh) - MOD_FREQ_RES * 12 * 60) < 1e-9


def test_arff_roundtrip(spark, tmp_path):
    from rp_extract_spark.sources.arff import load_arff, save_arff

    df = spark.createDataFrame(
        [("a", [1.5, -2.0, 3.25]), ("b", [0.0, 4.125, -5.5])],
        "image_id string, vec array<double>",
    )
    p = str(tmp_path / "feat.arff")
    save_arff(df, p, "vec", relation="rp_features")
    txt = open(p).read()
    assert txt.startswith("@relation rp_features")
    assert "@attribute v3 numeric" in txt and "@data" in txt
    back = {r.id: list(r.vec) for r in load_arff(spark, p).collect()}
    assert back == {"a": [1.5, -2.0, 3.25], "b": [0.0, 4.125, -5.5]}
