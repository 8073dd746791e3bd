"""Round-6 per-query measurement harness (guide §1).

Times individual declared queries with the noop sink (isolating compute
from the driver-side collect) and captures ``.explain("formatted")``
into ``plans/r06/<query>_<tag>.txt`` so plan claims in
OPTIMIZATION_r06.md are checkable. bench.py stays frozen; this is the
"extra benchmarks in a separate file" channel.

Usage:
    python tools/r06_measure.py --sf /root/testdata/sf1.0 \
        --tag before --reps 2 dim_trunc pmi_collocations
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--tag", default=None, help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from rp_extract_spark.plans.driver_queries import QUERIES
    from rp_extract_spark.session import get_spark

    spark = get_spark("r06-measure", cores=args.cores,
                      shuffle_partitions=args.cores)
    # same warm-up shape as bench.py so first-touch JVM costs are not
    # charged to the first measured query
    from pyspark.sql import functions as F
    spark.read.parquet(f"{args.sf}/lineitem.parquet").groupBy(
        "l_returnflag").count().write.format("noop").mode("overwrite").save()
    spark.read.parquet(f"{args.sf}/documents.parquet").groupBy(
        F.md5("text").alias("h")).count().write.format("noop").mode(
        "overwrite").save()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in args.queries:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"r06:{name}")
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        if args.tag:
            import contextlib
            import io
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(buf.getvalue())
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "reps": args.reps, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
