"""Batch extraction CLI — reference entry point 1 analog
(``python rp_extract_batch.py <input_dir> <output>``,
/root/reference/rp_extract_batch.py:329-425; SURVEY §3.1).

Scans a directory for media files, extracts descriptor vectors
distributed, and writes the feature store: parquet snapshot + lineage
manifest (+ optional reference-format CSV sidecar). ``--append-diff``
resumes incrementally like the reference's append_diff mode (anti-join
against existing output). ``--audio`` switches the pipeline to the
TRUE audio path over WAV files.

Usage:
  python tools/extract_batch.py IN_DIR OUT_DIR [--audio] [--append-diff]
         [--csv] [--cores N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("in_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--audio", action="store_true",
                    help="extract from WAV files via the audio kernel")
    ap.add_argument("--append-diff", action="store_true",
                    help="incremental resume (anti-join against output)")
    ap.add_argument("--csv", action="store_true",
                    help="also write the reference id,v1..vN CSV layout (rp)")
    ap.add_argument("--h5", action="store_true",
                    help="also write reference HDF5 feature stores "
                         "(<out>/features.<type>.h5 per feature type, "
                         "the reference's -h5 flag, "
                         "rp_extract_batch.py:480)")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from rp_extract_spark.operators.resume import (
        incremental_extract,
        write_snapshot,
    )
    from rp_extract_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("extract-batch", cores=args.cores,
                      shuffle_partitions=args.cores)

    if args.audio:
        from rp_extract_spark.operators.multimodal import extract_features_audio

        clips = (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            # decode_audio dispatches WAV and FLAC natively and MP3
            # through the in-repo Layer III decoder (unsupported
            # streams error-isolate per record, matching the
            # reference's audiotypes scan, rp_extract_batch.py:241-264)
            .option("pathGlobFilter", "*.{wav,mp3,flac}")
            .load(args.in_dir)
            .select(
                F.regexp_replace(
                    F.element_at(F.split("path", "/"), -1), r"\.[^.]*$", ""
                ).alias("clip_id"),
                F.col("content").alias("bytes"),
            )
        )
        extract = extract_features_audio
        df, key = clips, "clip_id"
    else:
        from rp_extract_spark.operators.extract import extract_features
        from rp_extract_spark.sources.files import scan_image_dir

        images = scan_image_dir(spark, args.in_dir)
        # entity/ts/caption columns the kernel schema expects: the batch
        # CLI has no timeline, so entity = parent dir, ts = epoch
        images = (
            images.withColumn(
                "entity_id", F.element_at(F.split("path", "/"), -2)
            )
            .withColumn("ts", F.timestamp_seconds(F.lit(0)))
            .withColumn("caption", F.lit(None).cast("string"))
        )
        extract = extract_features
        df, key = images, "image_id"

    if args.append_diff:
        manifest = incremental_extract(spark, df, args.out_dir, extract, key=key)
    else:
        manifest = write_snapshot(extract(df), args.out_dir, ts_col=None)

    if args.csv or args.h5:
        feats = spark.read.parquet(os.path.join(args.out_dir, "data"))
        ok = feats.filter(F.col("err").isNull()) if "err" in feats.columns else feats
    if args.csv:
        # one CSV store per feature type, like the reference's
        # <filename>.<type>.csv outputs (rp_feature_io.py:320-336)
        from rp_extract_spark.sources.files import write_csv_features

        for ftype in ("rp", "ssd", "rh"):
            if ftype in ok.columns:
                write_csv_features(
                    ok, os.path.join(args.out_dir, f"csv_{ftype}"),
                    feature=ftype, id_col=key,
                )
    if args.h5:
        from rp_extract_spark.sources.hdf5 import write_h5_features

        for ftype in ("rp", "ssd", "rh"):
            if ftype in ok.columns:
                write_h5_features(
                    ok.select(key, F.col(ftype).alias("vec")),
                    os.path.join(args.out_dir, f"features.{ftype}"),
                    id_col=key, vec_type=ftype,
                )

    print({"rows": manifest["total_rows"], "errors": manifest["total_errors"],
           "snapshot": manifest["snapshot_id"]})
    if owns_session:  # don't stop a session we joined (e.g. pytest's)
        spark.stop()
    return manifest


if __name__ == "__main__":
    main()
