"""Two-parallelism scaling evidence for the TRUE-audio kernel
(extract_features_audio): local[N] vs local[4N], fresh JVM each, on an
identical parquet file set of WAV clips. Mirrors tools/bench_scaling.py
(the official image-path protocol) and replaces the round-2
"inconclusive (host noise)" note with a measured number.

Protocol details that matter on this noisy host (see CLAUDE.md):
interleaved repetitions, best run per level (contention-free
estimate), warm-up job per session before timing.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _scaling import REPO, format_section, measure, splice_section  # noqa: E402

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
import numpy as np
import pandas as pd
from rp_extract_spark.session import get_spark

spark = get_spark("audio-scaling-gen", cores=8, shuffle_partitions=8)
# (cores=8: 32-thread sessions intermittently wedge on this virtualized
# host — see CLAUDE.md benchmark notes; generation speed is irrelevant)
n, sr, secs = {n_clips}, 22050, 13.0

def gen(batches):
    from rp_extract_spark.codecs.wav import encode_wav
    for b in batches:
        rows = []
        for cid in b["id"].values:
            rng = np.random.default_rng(1000 + int(cid))
            t = np.arange(int(sr * secs)) / sr
            x = (0.4 * np.sin(2 * np.pi * (80 + cid % 700) * t)
                 + 0.2 * np.sin(2 * np.pi * 3.7 * t) ** 2
                 + 0.1 * rng.standard_normal(t.size))
            rows.append((f"clip{cid:06d}",
                         encode_wav((x * 0.9).astype(np.float64), sr, samplewidth=2)))
        yield pd.DataFrame(rows, columns=["clip_id", "bytes"])

(spark.range({n_clips}).withColumnRenamed("id", "id")
 .repartition(64)
 .mapInPandas(gen, "clip_id string, bytes binary")
 .write.mode("overwrite").parquet({clip_dir!r}))
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from rp_extract_spark.session import get_spark
from rp_extract_spark.operators.multimodal import extract_features_audio

cores = {cores}
spark = get_spark("audio-scaling", cores=cores, shuffle_partitions=cores,
                  extra={{"spark.sql.files.maxPartitionBytes": "16m",
                         "spark.sql.execution.arrow.maxRecordsPerBatch": "32"}})
clips = spark.read.parquet({clip_dir!r})
# warm-up: python worker pool + codegen on a small slice
extract_features_audio(clips.limit(2 * cores)).select("clip_id", "err").count()

t0 = time.time()
out = extract_features_audio(clips)
n = out.select("clip_id", "samplerate", "err").where("err is null").count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "rows": n, "wall_s": dt,
                   "rows_per_sec": n / dt}}))
spark.stop()
"""


def main() -> None:
    n_clips = int(os.environ.get("AUDIO_CLIPS", "7200"))
    n_small = int(os.environ.get("SCALING_N", "2"))
    n_large = 4 * n_small
    reps = int(os.environ.get("SCALING_REPS", "3"))
    base = tempfile.mkdtemp(prefix="audio-scaling-")
    clip_dir = os.path.join(base, "clips")
    try:
        subprocess.run([sys.executable, "-c",
                        GEN.format(repo=REPO, n_clips=n_clips, clip_dir=clip_dir)],
                       check=True, capture_output=True, text=True,
                       timeout=2400, cwd=REPO)
        result = measure(
            RUNNER.format(repo=REPO, cores=n_small, clip_dir=clip_dir),
            RUNNER.format(repo=REPO, cores=n_large, clip_dir=clip_dir),
            reps,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    result.update({
        "job": "parquet scan -> WAV decode -> TRUE audio spectrogram+descriptor kernel",
        "input": f"{n_clips} x 13 s 22.05 kHz WAV clips, parquet, identical file set",
    })
    intro = (
        f"Job: parquet scan -> WAV decode -> TRUE audio kernel "
        f"(spectrogram + RP/SSD/RH/MVD), {n_clips} x 13 s clips, fresh JVM per\n"
        "run, interleaved repetitions, best per level:"
    )
    splice_section("Audio-path scaling", format_section(
        "Audio-path scaling (official, tools/bench_scaling_audio.py)",
        intro, result))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
