"""Two-parallelism scaling evidence for the IMAGE-CURATION pipeline
(decode -> perceptual-hash scan -> dHash Hamming-band near-dup dedup):
local[N] vs local[4N], fresh JVM each, identical parquet image set.

Complements the shuffle-free image-kernel job (bench_scaling.py): this
one exercises the round-5 image block end to end — the Arrow decode+
hash scan (CPU-bound leaf) followed by the band-bucket candidate join,
bit_count verification and the min-label component fixpoint, where the
only shuffled payload is (image_id, int64). Protocol as in
tools/_scaling.py: interleaved repetitions, best run per level,
warm-up per session.
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
from rp_extract_spark.codecs import encode_png
from rp_extract_spark.session import get_spark

spark = get_spark("phash-scaling-gen", cores=8, shuffle_partitions=8)

def gen(batches):
    for b in batches:
        rows = []
        for i in b["id"].values:
            i = int(i)
            # ~10% of images draw their base from a 2000-group pool
            # (small near-dup clusters); the rest are unique. Bases are
            # seeded-random per group — a constant-offset formula family
            # would leave the gradient signs (hence the dHash) identical
            # across unrelated images and collapse the corpus into one
            # giant component (the degenerate-graph lesson from the
            # text-corpus generator, CLAUDE.md).
            if i % 10 == 0:
                g, v = (i // 10) % 2000, (i // 10) % 3
            else:
                g, v = 1_000_000 + i, 0
            px = np.random.default_rng(g).integers(
                0, 256, (16, 16), dtype=np.int64
            )
            if v >= 1:
                px[0, 0] = (px[0, 0] + 128) % 256
            if v == 2:
                px[2, 0] = (px[2, 0] + 128) % 256
            rows.append((f"img{{i:08d}}", encode_png(px.astype(np.uint8)),
                         "png"))
        yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

(spark.range({n_images}).repartition(64)
 .mapInPandas(gen, "image_id string, bytes binary, fmt string")
 .write.mode("overwrite").parquet({img_dir!r}))
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rp_extract_spark.operators.images import phash_dedup
from rp_extract_spark.session import get_spark

cores = {cores}
# small-image binary scans: the default 128m maxPartitionBytes packs a
# 350 MB corpus into ~3 scan partitions and serializes the decode at
# ANY core count (first 1M-run measured 0.295 efficiency from exactly
# this). 4m yields ~90 scan tasks without shuffling image bytes — the
# same fix the audio fat-binary scans document in CLAUDE.md.
spark = get_spark("phash-scaling", cores=cores, shuffle_partitions=cores,
                  extra={{"spark.sql.files.maxPartitionBytes": "4m",
                          "spark.sql.files.openCostInBytes": "0"}})
imgs = spark.read.parquet({img_dir!r})
# warm-up: python worker pool + codegen on a tiny slice
phash_dedup(imgs.limit(4 * cores), hash_type="dhash", max_hamming=2).count()

t0 = time.time()
labels = phash_dedup(imgs, hash_type="dhash", max_hamming=2)
n_reps = labels.filter(F.col("image_id") == F.col("rep_id")).count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "rows": n_reps, "wall_s": dt,
                   "rows_per_sec": {n_images} / dt}}))
spark.stop()
"""


def main() -> None:
    n_images = int(os.environ.get("SCALING_IMAGES", "200000"))
    n_small = int(os.environ.get("SCALING_N", "2"))
    n_large = 4 * n_small
    reps = int(os.environ.get("SCALING_REPS", "2"))
    base = tempfile.mkdtemp(prefix="phash-scaling-")
    img_dir = os.path.join(base, "imgs")
    try:
        subprocess.run(
            [sys.executable, "-c",
             GEN.format(repo=REPO, n_images=n_images, img_dir=img_dir)],
            check=True, capture_output=True, text=True, timeout=2400,
            cwd=REPO,
        )
        result = measure(
            RUNNER.format(repo=REPO, cores=n_small, img_dir=img_dir,
                          n_images=n_images),
            RUNNER.format(repo=REPO, cores=n_large, img_dir=img_dir,
                          n_images=n_images),
            reps,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    result.update({
        "job": ("parquet scan -> PNG decode + dHash scan (Arrow leaf) -> "
                "Hamming-band candidate join + bit_count verify + "
                "min-label components -> representative count"),
        "input": f"{n_images} synthesized 16x16 PNGs (~10% near-dups)",
    })
    intro = (
        f"Job: decode -> dHash -> Hamming(<=2) near-dup dedup on\n"
        f"{n_images} images — the round-5 image-curation block end to\n"
        "end (CPU-bound hash scan + the band join/fixpoint where only\n"
        "(id, int64) shuffles). Fresh JVM per run, interleaved\n"
        "repetitions, best per level; images/sec counts INPUT images:"
    )
    splice_section("Image-dedup scaling", format_section(
        "Image-dedup scaling (tools/bench_scaling_phash.py)",
        intro, result, rate_label="images/sec"))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
