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
         [--cores N]
  MODEL_BASENAME defaults to the reference's shipped GTZAN model
  (rp_classify.py:293), expecting <base>.model.pkl / .scaler.pkl /
  .labelenc.pkl next to each other.
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
    ok = feats.filter(F.col("err").isNull())
    # the model's default feature set: ssd + rh, concatenated in
    # feature_types order (rp_classify.py:200-201, :249-251)
    vecs = ok.select(
        "clip_id", F.concat(F.col("ssd"), F.col("rh")).alias("features")
    )
    preds = classify_vectors(vecs, model, "features", "genre")
    rows = [(r["clip_id"], r["genre"])
            for r in preds.select("clip_id", "genre")
            .orderBy("clip_id").collect()]
    failed = [r["clip_id"] for r in
              feats.filter(F.col("err").isNotNull())
              .select("clip_id").collect()]

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
