"""spark-submit entry point (north_rule: runs via spark-submit
--py-files on multi-executor clusters).

Usage:
    python tools/make_pyfiles.py                       # builds dist/rp_extract_spark.zip
    spark-submit --master local[8] \
        --py-files dist/rp_extract_spark.zip \
        tools/submit_job.py --images 2000 --out /tmp/features_out

Runs the flagship pipeline (synthesize → extract → as-of captions →
sessionize) and writes a snapshot + lineage manifest. On a real
cluster replace --master and point --out at shared storage.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    # spark-submit provides the session; --py-files ships the package
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("rp-extract-flagship").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rp_extract_spark.operators.resume import write_snapshot
    from rp_extract_spark.plans.flagship import flagship

    out = flagship(spark, n_images=args.images, seed=args.seed)
    manifest = write_snapshot(out.drop("rp", "ssd", "rh"), args.out, mode="overwrite")
    print(json.dumps({"status": "ok", "snapshot": manifest["snapshot_id"],
                      "rows": manifest["total_rows"]}))
    spark.stop()


if __name__ == "__main__":
    main()
