"""Batch CLI (reference entry point 1 analog): scan dir -> extract ->
snapshot (+ CSV sidecar), incremental re-run appends nothing."""

import numpy as np

from rp_extract_spark.codecs import encode_png
from rp_extract_spark.codecs.bmp import encode_bmp


def _write_images(d, n=6):
    rng = np.random.default_rng(1)
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        px = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        if i % 3 == 0:
            (d / f"img{i}.bmp").write_bytes(encode_bmp(px))
        else:
            (d / f"img{i}.png").write_bytes(encode_png(px))


def test_batch_cli_images(spark, tmp_path, monkeypatch):
    # reuse the session: get_spark returns the active one
    from tools.extract_batch import main

    src = tmp_path / "in" / "setA"
    _write_images(src)
    out = str(tmp_path / "out")
    m1 = main([str(tmp_path / "in"), out, "--append-diff", "--csv", "--cores", "4"])
    assert m1["total_rows"] == 6 and m1["total_errors"] == 0
    # idempotent re-run
    m2 = main([str(tmp_path / "in"), out, "--append-diff", "--cores", "4"])
    assert m2["total_rows"] == 6
    feats = spark.read.parquet(out + "/data")
    assert feats.count() == 6
    assert len(feats.first().rp) == 1440
    # CSV sidecar in the reference id,v1..vN layout
    csv = spark.read.csv(out + "/csv_rp", header=False)
    assert csv.count() == 6 and len(csv.columns) == 1441


def test_batch_cli_audio(spark, tmp_path):
    from rp_extract_spark.codecs.wav import encode_wav
    from tools.extract_batch import main

    rng = np.random.default_rng(2)
    src = tmp_path / "wavs"
    src.mkdir()
    for i in range(2):
        t = np.arange(int(13.0 * 11025)) / 11025
        x = (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        (src / f"clip{i}.wav").write_bytes(encode_wav(x, 11025, samplewidth=4))
    out = str(tmp_path / "aout")
    m = main([str(src), out, "--audio", "--cores", "4"])
    assert m["total_rows"] == 2 and m["total_errors"] == 0
    feats = spark.read.parquet(out + "/data")
    r = feats.orderBy("clip_id").first()
    assert r.err is None and len(r.rp) == 1440 and r.samplerate == 11025


def test_batch_cli_h5_sidecar(spark, tmp_path):
    """--h5 writes reference-layout .h5 stores readable back through
    the distributed scan (the reference's -h5 flag analog)."""
    from rp_extract_spark.sources.hdf5 import read_h5_features
    from tools.extract_batch import main

    src = tmp_path / "in" / "setB"
    _write_images(src, n=4)
    out = str(tmp_path / "out_h5")
    m = main([str(tmp_path / "in"), out, "--h5", "--cores", "4"])
    assert m["total_rows"] == 4
    back = read_h5_features(spark, f"{out}/features.ssd.h5")
    rows = back.collect()
    assert len(rows) == 4
    assert all(len(r.vec) == 168 for r in rows)  # ssd dim
    assert rows[0].vec_type == "SSD"
    rp = read_h5_features(spark, f"{out}/features.rp.h5").first()
    assert len(rp.vec) == 1440


def test_batch_cli_audio_flac(spark, tmp_path):
    """The --audio scan picks up *.flac and decodes it through the
    native FLAC codec to the same descriptor surface as WAV."""
    from rp_extract_spark.codecs.flac import encode_flac
    from tools.extract_batch import main

    rng = np.random.default_rng(3)
    src = tmp_path / "flacs"
    src.mkdir()
    t = np.arange(int(13.0 * 11025)) / 11025
    x = 0.5 * np.sin(2 * np.pi * 220 * t) + rng.normal(0, 0.01, t.size)
    (src / "clip.flac").write_bytes(encode_flac(x, 11025, bits=16))
    out = str(tmp_path / "fout")
    m = main([str(src), out, "--audio", "--cores", "4"])
    assert m["total_rows"] == 1 and m["total_errors"] == 0
    r = spark.read.parquet(out + "/data").first()
    assert r.err is None and len(r.rp) == 1440
    # 11025 is a reference-supported rate: auto_resample leaves it
    assert r.samplerate == 11025
