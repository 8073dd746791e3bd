"""Two-parallelism scaling evidence for the GRAPH path (fixed-
iteration PageRank): local[N] vs local[4N], fresh JVM each, identical
parquet edge set.

Fifth member of the scaling evidence set: where the image/audio jobs
stress the Arrow leaf stages, the corpus job the shuffle machinery and
the PQ job pure codegen compute, PageRank stresses REPEATED JOIN+AGG
ROUNDS over one cached edge table — the iterative-workload shape
(components, label propagation, ranking) whose per-round stage latency
is exactly what bounds a 1000-executor cluster's efficiency on graph
work. Protocol as in tools/_scaling.py: interleaved repetitions, best
run per level, warm-up per session.
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
from pyspark.sql import functions as F
from rp_extract_spark.session import get_spark

spark = get_spark("graph-scaling-gen", cores=8, shuffle_partitions=8)
n = {n_nodes}
d = spark.range(n, numPartitions=64).select(F.col("id").alias("u"))
edges = (
    d.select("u", ((F.col("u") * 7 + 3) % n).alias("v"))
    .unionByName(d.select("u", ((F.col("u") * 13 + 5) % n).alias("v")))
    .unionByName(d.select("u", ((F.col("u") + 1) % n).alias("v")))
)
edges.write.mode("overwrite").parquet({edge_dir!r})
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from rp_extract_spark.session import get_spark
from rp_extract_spark.operators.graph import pagerank_fixed

cores = {cores}
iters = {iters}
spark = get_spark("graph-scaling", cores=cores, shuffle_partitions=cores,
                  extra={{"spark.sql.files.maxPartitionBytes": "8m",
                          "spark.sql.files.openCostInBytes": "0"}})
edges = spark.read.parquet({edge_dir!r})
# warm-up: codegen + shuffle machinery on a small slice
pagerank_fixed(edges.limit(4 * cores), "u", "v", iters=1).count()
t0 = time.time()
n_out = pagerank_fixed(edges, "u", "v", iters=iters).count()
dt = time.time() - t0
assert n_out == {n_nodes}
traversals = {n_edges} * iters
print(json.dumps({{"cores": cores, "rows": n_out, "wall_s": dt,
                   "rows_per_sec": traversals / dt}}))
spark.stop()
"""


def main() -> None:
    n_nodes = int(os.environ.get("SCALING_NODES", "1000000"))
    iters = int(os.environ.get("SCALING_ITERS", "5"))
    n_small = int(os.environ.get("SCALING_N", "2"))
    n_large = 4 * n_small
    reps = int(os.environ.get("SCALING_REPS", "2"))
    n_edges = 3 * n_nodes  # before distinct; the rate metric is nominal
    base = tempfile.mkdtemp(prefix="graph-scaling-")
    edge_dir = os.path.join(base, "edges")
    try:
        subprocess.run(
            [sys.executable, "-c",
             GEN.format(repo=REPO, n_nodes=n_nodes, edge_dir=edge_dir)],
            check=True, capture_output=True, text=True, timeout=2400,
            cwd=REPO,
        )
        result = measure(
            RUNNER.format(repo=REPO, cores=n_small, edge_dir=edge_dir,
                          n_nodes=n_nodes, n_edges=n_edges, iters=iters),
            RUNNER.format(repo=REPO, cores=n_large, edge_dir=edge_dir,
                          n_nodes=n_nodes, n_edges=n_edges, iters=iters),
            reps,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    result.update({
        "job": (f"parquet edge scan -> {iters}-iteration integer "
                "PageRank (join+agg rounds over one cached edge table)"),
        "input": f"{n_nodes} nodes / ~{n_edges} synthesized edges, parquet",
    })
    intro = (
        f"Job: {iters}-iteration integer PageRank over ~{n_edges} edges\n"
        f"({n_nodes} nodes) — the iterative join+agg workload shape\n"
        "(components/label propagation/ranking). Fresh JVM per run,\n"
        "interleaved repetitions, best per level; rate counts edge\n"
        "traversals (edges x iterations) per second:"
    )
    splice_section("Graph (PageRank) scaling", format_section(
        "Graph (PageRank) scaling (tools/bench_scaling_graph.py)",
        intro, result, rate_label="traversals/sec"))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
