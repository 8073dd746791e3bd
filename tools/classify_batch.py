"""Genre-classification CLI — reference entry point 3 analog
(``python rp_classify.py <input_path> [model_file] [output]``,
/root/reference/rp_classify.py:162-352; prediction path only — training
uses the engine-native models in operators/classify.py).

Scans a directory for audio files, extracts the reference's default
ssd+rh feature set distributed, loads the reference's pickled sklearn
model trio WITHOUT sklearn (restricted unpickler,
rp_extract_spark/sources/sklearn_models.py) and scores every clip in
one Arrow-batched scan. Predictions print as the reference's
``<filename>\t<class>`` class-file lines (classes_io.py write format)
or write to the given output file.

Usage:
  python tools/classify_batch.py IN_DIR [MODEL_BASENAME] [OUT_FILE]
         [--cores N] [--from-features csv|h5]
  MODEL_BASENAME defaults to the reference's shipped GTZAN model
  (rp_classify.py:293), expecting <base>.model.pkl / .scaler.pkl /
  .labelenc.pkl next to each other.

``--from-features`` mirrors the reference's load_or_analyze_features
dispatch (rp_feature_io.py:695-745): instead of extracting from audio,
IN_DIR is an extract_batch output directory whose pre-extracted
feature stores are loaded — ``features.ssd.h5``/``features.rh.h5``
(h5) or ``csv_ssd``/``csv_rh`` (csv) — joined on id and concatenated.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_MODEL = "/root/reference/models/GTZAN"


def main(argv=None) -> list[tuple[str, str]]:
    ap = argparse.ArgumentParser()
    ap.add_argument("in_dir")
    ap.add_argument("model", nargs="?", default=DEFAULT_MODEL)
    ap.add_argument("out_file", nargs="?", default=None)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--from-features", choices=["csv", "h5"], default=None,
                    help="load pre-extracted ssd+rh feature stores from "
                         "IN_DIR instead of analyzing audio "
                         "(rp_feature_io.load_or_analyze_features analog)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from rp_extract_spark.operators.multimodal import extract_features_audio
    from rp_extract_spark.session import get_spark
    from rp_extract_spark.sources.sklearn_models import (
        classify_vectors,
        load_reference_model,
    )

    model = load_reference_model(args.model)

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("classify-batch", cores=args.cores,
                      shuffle_partitions=args.cores)

    failed: list[str] = []
    if args.from_features == "h5":
        from rp_extract_spark.sources.hdf5 import read_h5_features

        def _h5(t):
            return read_h5_features(
                spark, os.path.join(args.in_dir, f"features.{t}.h5")
            ).select(F.col("file_id").alias("clip_id"),
                     F.col("vec").alias(t))

        vecs = _h5("ssd").join(_h5("rh"), "clip_id")
    elif args.from_features == "csv":
        from rp_extract_spark.sources.files import read_csv_features

        def _csv(t):
            return read_csv_features(
                spark, os.path.join(args.in_dir, f"csv_{t}")
            ).select(F.col("id").alias("clip_id"), F.col("vec").alias(t))

        vecs = _csv("ssd").join(_csv("rh"), "clip_id")
    else:
        clips = (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.{wav,mp3,flac}")
            .load(args.in_dir)
            .select(
                F.element_at(F.split("path", "/"), -1).alias("clip_id"),
                F.col("content").alias("bytes"),
            )
        )
        feats = extract_features_audio(clips)
        vecs = feats.filter(F.col("err").isNull())
        failed = [r["clip_id"] for r in
                  feats.filter(F.col("err").isNotNull())
                  .select("clip_id").collect()]
    # the model's default feature set: ssd + rh, concatenated in
    # feature_types order (rp_classify.py:200-201, :249-251)
    vecs = vecs.select(
        "clip_id", F.concat(F.col("ssd"), F.col("rh")).alias("features")
    )
    # dimension assertion before scoring, like rp_classify.py:313-317
    probe = vecs.select(F.size("features").alias("n")).first()
    if probe is not None and probe["n"] != model.dim:
        raise ValueError(
            f"Feature dimension mismatch: got {probe['n']}, model expects "
            f"{model.dim} (ssd+rh). Wrong feature set or store?")
    preds = classify_vectors(vecs, model, "features", "genre")
    rows = [(r["clip_id"], r["genre"])
            for r in preds.select("clip_id", "genre")
            .orderBy("clip_id").collect()]

    lines = "".join(f"{cid}\t{genre}\n" for cid, genre in rows)
    if args.out_file:
        with open(args.out_file, "w") as f:
            f.write(lines)
    else:
        sys.stdout.write(lines)
    if failed:
        print(f"# {len(failed)} file(s) failed to decode: "
              + ", ".join(sorted(failed)), file=sys.stderr)

    if owns_session:
        spark.stop()
    return rows


if __name__ == "__main__":
    main()
