"""Feature-extraction operator: decode + descriptor kernel, fused.

One ``mapInPandas`` stage computes the shared prefix (decode → scaled
band matrix) once and emits all requested feature families — the
Spark-side form of the reference's operator gating where one sonogram
feeds RP+SSD+RH (rp_extract.py:398-408, SURVEY.md O3). Per-record
error isolation follows the reference's batch loop
(rp_extract_batch.py:421-425): a bad image never fails the stage; it
yields null features and a populated ``err`` column for quarantine.

Aggregated (per-entity) mode mirrors rp_extract.py:765-795: exact
median for RP/RH, mean for SSD/MVD, 7-stat-over-time for TSSD/TRH —
computed per entity via ``applyInPandas`` (exact median over arrays is
not expressible with builtin aggs without exploding 1440-wide arrays).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image
from ..functions.kernel import (
    aggregate_segments,
    extract_segment_features,
    extract_segment_features_batch,
)

_ARR = T.ArrayType(T.DoubleType())

SEGMENT_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("rp", _ARR, True),
        T.StructField("ssd", _ARR, True),
        T.StructField("rh", _ARR, True),
        T.StructField("rh2", _ARR, True),
        T.StructField("mvd", _ARR, True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("err", T.StringType(), True),
    ]
)

ENTITY_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("n_segments", T.IntegerType(), False),
        T.StructField("rp", _ARR, True),
        T.StructField("ssd", _ARR, True),
        T.StructField("rh", _ARR, True),
        T.StructField("rh2", _ARR, True),
        T.StructField("mvd", _ARR, True),
        T.StructField("tssd", _ARR, True),
        T.StructField("trh", _ARR, True),
    ]
)


def extract_features(images: DataFrame) -> DataFrame:
    """Per-segment (per-image) feature extraction.

    Input: the input_hint table (+ entity_id, ts). Output: one row per
    image with rp/ssd/rh/mvd vectors, caption passed through, err null
    on success. Catalyst prunes unused input columns from the parquet
    scan because mapInPandas declares its input projection explicitly.

    The PSNR>=40dB lossy-decode gate is a *fixture-level* invariant
    (the original pixels exist only test-side); see
    tests/test_codecs.py::test_lossy_psnr_gate.
    """
    cols = ["entity_id", "ts", "image_id", "bytes", "fmt", "caption"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            errs: list[str | None] = [None] * n
            pixels: list = [None] * n
            ok: list[int] = []
            # decode with per-record isolation
            for i, (data, fmt) in enumerate(zip(b["bytes"].values, b["fmt"].values)):
                try:
                    pixels[i] = decode_image(
                        bytes(data) if data is not None else b"", fmt
                    )
                    ok.append(i)
                except Exception as e:  # noqa: BLE001 — per-record isolation
                    errs[i] = f"{type(e).__name__}: {e}"
            # batched kernel over decodable images (grouped by shape);
            # kernel errors (e.g. too-small images) fall back per image
            feats: dict[str, list] = {
                k: [None] * n for k in ("rp", "ssd", "rh", "rh2", "mvd")
            }
            if ok:
                try:
                    results = extract_segment_features_batch(
                        [pixels[i] for i in ok]
                    )
                except Exception:
                    results = []
                    for i in ok:
                        try:
                            results.append(extract_segment_features(pixels[i]))
                        except Exception as e:  # noqa: BLE001
                            errs[i] = f"{type(e).__name__}: {e}"
                            results.append(None)
                for i, f in zip(ok, results):
                    if f is not None:
                        for k in feats:
                            feats[k][i] = f[k]
            out = {
                "entity_id": b["entity_id"],
                "ts": b["ts"],
                "image_id": b["image_id"],
                **feats,
                "caption": b["caption"],
                "err": errs,
            }
            yield pd.DataFrame(
                out,
                columns=[f.name for f in SEGMENT_FEATURE_SCHEMA.fields],
            )

    return images.select(*cols).mapInPandas(run, SEGMENT_FEATURE_SCHEMA)


def quarantine(features: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split good rows from errored rows (reference's error log,
    rp_extract_batch.py:421-425, as a DataFrame pair)."""
    return features.filter(F.col("err").isNull()), features.filter(
        F.col("err").isNotNull()
    )


def aggregate_entity_features(segment_features: DataFrame) -> DataFrame:
    """Per-entity aggregation: median(rp, rh), mean(ssd, mvd), temporal
    7-stat (tssd, trh). Shuffles once on entity_id; each group is the
    entity's segment list ordered by ts (order matters only for
    determinism of the temporal stats' time axis)."""

    def agg(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["err"].isnull()]
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=[f.name for f in ENTITY_FEATURE_SCHEMA.fields]
            )
        pdf = pdf.sort_values(["ts", "image_id"])
        rp = np.stack(pdf["rp"].values)
        ssd = np.stack(pdf["ssd"].values)
        rh = np.stack(pdf["rh"].values)
        rh2 = np.stack(pdf["rh2"].values)
        mvd = np.stack(pdf["mvd"].values)
        a = aggregate_segments(rp, ssd, rh, mvd)
        # rh2: the reference computes it per segment but never aggregates
        # (rp_extract.py:745-747 collects rh2_list and drops it); median
        # mirrors the RH rule
        a["rh2"] = np.median(rh2, axis=0)
        return pd.DataFrame(
            [
                {
                    "entity_id": key[0],
                    "n_segments": len(pdf),
                    "rp": a["rp"],
                    "ssd": a["ssd"],
                    "rh": a["rh"],
                    "rh2": a["rh2"],
                    "mvd": a["mvd"],
                    "tssd": a["tssd"],
                    "trh": a["trh"],
                }
            ]
        )

    return segment_features.groupBy("entity_id").applyInPandas(
        agg, ENTITY_FEATURE_SCHEMA
    )
