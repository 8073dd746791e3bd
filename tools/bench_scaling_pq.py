"""Two-parallelism scaling evidence for the EMBEDDING-COMPRESSION
path (PQ encode + ADC top-k): local[N] vs local[4N], fresh JVM each,
identical parquet vector set.

The compressed-domain ANN serve pipeline is the fourth member of the
scaling evidence set (image/audio kernels: shuffle-free Arrow leaves;
corpus pipeline: shuffle-heavy). PQ encode is a pure codegen'd
projection (the inlined-literal codebook argmin — no Python, no
shuffle) and the ADC top-k is TakeOrdered, so this job evidences that
the WHOLE-STAGE-CODEGEN compute path scales, complementing the
Arrow-UDF and shuffle jobs. Protocol as in tools/_scaling.py:
interleaved repetitions, best run per level, warm-up per session.
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

spark = get_spark("pq-scaling-gen", cores=8, shuffle_partitions=8)

def gen(batches):
    for b in batches:
        ids = b["id"].values
        # one rng per BATCH (per-row generators are 10x slower and this
        # is fixture synthesis, not the measured job); seeded by the
        # batch's first id so the dataset is partition-stable
        rng = np.random.default_rng(int(ids[0]))
        vals = rng.standard_normal((len(ids), 64))
        yield pd.DataFrame({{"vec_id": ids,
                             "embedding": [v.tolist() for v in vals]}})

(spark.range({n_vecs}, numPartitions=64)
 .mapInPandas(gen, "vec_id long, embedding array<double>")
 .write.mode("overwrite").parquet({vec_dir!r}))
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
from rp_extract_spark.session import get_spark
from rp_extract_spark.operators.similarity import pq_encode, pq_topk

cores = {cores}
# ~0.5 KB/vector parquet: the default 128m maxPartitionBytes bin-packs
# the whole corpus into ~4 scan partitions and idles most cores (the
# phash-bench lesson, BENCH/BASELINE.md) — 4m splits keep ~1 task per
# generated file without shuffling anything.
spark = get_spark("pq-scaling", cores=cores, shuffle_partitions=cores,
                  extra={{"spark.sql.files.maxPartitionBytes": "4m",
                          "spark.sql.files.openCostInBytes": "0"}})
vecs = spark.read.parquet({vec_dir!r})
rng = np.random.default_rng(12345)
model = spark.createDataFrame(
    [(s, str(c), rng.standard_normal(16).tolist())
     for s in range(4) for c in range(16)],
    "sub int, centroid_label string, centroid array<double>")
q = np.random.default_rng(99).standard_normal(64).tolist()
# warm-up: codegen compilation on a tiny slice
pq_topk(pq_encode(vecs.limit(4 * cores), model), model, q, k=10).collect()
t0 = time.time()
top = pq_topk(pq_encode(vecs, model), model, q, k=100).collect()
dt = time.time() - t0
assert len(top) == 100
print(json.dumps({{"cores": cores, "rows": len(top), "wall_s": dt,
                   "rows_per_sec": {n_vecs} / dt}}))
spark.stop()
"""


def main() -> None:
    # below ~500k vectors fixed stage latency dominates the 8-core wall
    # (first attempt at 300k measured 12.7 s walls and 0.663)
    n_vecs = int(os.environ.get("SCALING_VECS", "800000"))
    n_small = int(os.environ.get("SCALING_N", "2"))
    n_large = 4 * n_small
    reps = int(os.environ.get("SCALING_REPS", "2"))
    base = tempfile.mkdtemp(prefix="pq-scaling-")
    vec_dir = os.path.join(base, "vecs")
    try:
        subprocess.run(
            [sys.executable, "-c",
             GEN.format(repo=REPO, n_vecs=n_vecs, vec_dir=vec_dir)],
            check=True, capture_output=True, text=True, timeout=2400,
            cwd=REPO,
        )
        result = measure(
            RUNNER.format(repo=REPO, cores=n_small, vec_dir=vec_dir,
                          n_vecs=n_vecs),
            RUNNER.format(repo=REPO, cores=n_large, vec_dir=vec_dir,
                          n_vecs=n_vecs),
            reps,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    result.update({
        "job": ("parquet scan -> PQ encode (inlined-codebook codegen "
                "projection, m=4 k=16) -> ADC top-100 (TakeOrdered)"),
        "input": f"{n_vecs} synthesized 64-dim vectors, parquet",
    })
    intro = (
        f"Job: PQ encode (m=4, k=16, literal codebooks) -> ADC top-100\n"
        f"on {n_vecs} 64-dim vectors — the compressed-domain ANN serve\n"
        "path; pure whole-stage-codegen compute, zero shuffles, zero\n"
        "Python in the scan. Fresh JVM per run, interleaved\n"
        "repetitions, best per level; vecs/sec counts INPUT vectors:"
    )
    splice_section("Embedding-compression (PQ) scaling", format_section(
        "Embedding-compression (PQ) scaling (tools/bench_scaling_pq.py)",
        intro, result, rate_label="vecs/sec"))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
