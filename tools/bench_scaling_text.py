"""Two-parallelism scaling evidence for the CORPUS pipeline
(quality gates -> MinHash-LSH dedup -> sequence packing):
local[N] vs local[4N], fresh JVM each, identical parquet doc set.

This is the most shuffle-heavy of the three official scaling jobs
(image and audio kernels are shuffle-free mapInPandas leaves; this
one runs the banded signature join, the connected-component fixpoint
AND the distributed prefix sum), so it is the adversarial test of
the north rule. Protocol as in tools/bench_scaling.py: interleaved
repetitions, best run per level, warm-up per session.
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

spark = get_spark("text-scaling-gen", cores=8, shuffle_partitions=8)
VOCAB = [f"tok{{i:04d}}" for i in range(5000)]

def gen(batches):
    for b in batches:
        rows = []
        for did in b["id"].values:
            did = int(did)
            # 90% unique docs; 10% drawn from a 5000-doc pool so the
            # corpus has a realistic ~10% duplicate rate (small dup
            # groups), not one giant identical-doc component. Vocab is
            # 5000 tokens so UNRELATED docs do not shingle-collide.
            seed = did % 5000 if did % 10 == 0 else 1_000_000 + did
            rng = np.random.default_rng(seed)
            n = int(rng.integers(40, 121))
            idx = np.minimum(rng.zipf(1.2, size=n) - 1, len(VOCAB) - 1)
            rows.append((f"d{{did:07d}}", " ".join(VOCAB[i] for i in idx),
                         f"src{{did % 16}}"))
        yield pd.DataFrame(rows, columns=["doc_id", "text", "source"])

(spark.range({n_docs}).repartition(64)
 .mapInPandas(gen, "doc_id string, text string, source string")
 .write.mode("overwrite").parquet({doc_dir!r}))
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rp_extract_spark.session import get_spark
from rp_extract_spark.operators.curation import pack_sequences
from rp_extract_spark.operators.dedup import minhash_lsh_dedup
from rp_extract_spark.operators.text import analyze_documents

cores = {cores}
spark = get_spark("text-scaling", cores=cores, shuffle_partitions=cores)
# warm-up: python worker pool + codegen on a tiny slice
docs = spark.read.parquet({doc_dir!r})
analyze_documents(docs.limit(4 * cores)).count()

t0 = time.time()
gated = analyze_documents(docs).filter(
    (F.col("n_tokens") >= 20) & (F.col("punct_ratio") < 0.3)
).persist()  # feeds BOTH the dedup branch and the keep join — without
# the persist the quality-gate stage executes twice (Spark does not
# dedup common subtrees); materialization is part of the timed job
labels = minhash_lsh_dedup(gated, n_hashes=32, bands=8)
kept = gated.join(
    labels.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id"),
    "doc_id",
)
packed = pack_sequences(kept, budget=2048)
n = packed.count()
dt = time.time() - t0
gated.unpersist()
print(json.dumps({{"cores": cores, "rows": n, "wall_s": dt,
                   "rows_per_sec": {n_docs} / dt}}))
spark.stop()
"""


def main() -> None:
    # default matches the official regime: below ~500k docs fixed stage
    # latency dominates and the run would splice an invalid number over
    # the recorded BASELINE section (see CLAUDE.md)
    n_docs = int(os.environ.get("SCALING_DOCS", "1000000"))
    n_small = int(os.environ.get("SCALING_N", "2"))
    n_large = 4 * n_small
    reps = int(os.environ.get("SCALING_REPS", "2"))
    base = tempfile.mkdtemp(prefix="text-scaling-")
    doc_dir = os.path.join(base, "docs")
    try:
        subprocess.run(
            [sys.executable, "-c",
             GEN.format(repo=REPO, n_docs=n_docs, doc_dir=doc_dir)],
            check=True, capture_output=True, text=True, timeout=2400,
            cwd=REPO,
        )
        result = measure(
            RUNNER.format(repo=REPO, cores=n_small, doc_dir=doc_dir,
                          n_docs=n_docs),
            RUNNER.format(repo=REPO, cores=n_large, doc_dir=doc_dir,
                          n_docs=n_docs),
            reps,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    result.update({
        "job": ("parquet scan -> quality gates -> MinHash-LSH dedup "
                "(banded join + component fixpoint) -> sequence packing "
                "(distributed prefix sum)"),
        "input": f"{n_docs} synthesized docs (~10% exact dups), parquet",
    })
    intro = (
        f"Job: quality gates -> MinHash-LSH dedup -> sequence packing on\n"
        f"{n_docs} docs — the shuffle-heavy member of the scaling trio\n"
        "(banded signature join, component fixpoint, distributed prefix\n"
        "sum). Fresh JVM per run, interleaved repetitions, best per\n"
        "level; docs/sec counts INPUT documents:"
    )
    splice_section("Corpus-pipeline scaling", format_section(
        "Corpus-pipeline scaling (tools/bench_scaling_text.py)",
        intro, result, rate_label="docs/sec"))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
