"""Typed field extraction from JSON string columns — the
semi-structured ingestion step (event properties, API payloads,
sidecar metadata) a pipeline runs before anything relational can
touch the values. Reference scope: the engine's generic-source
guards (SURVEY S6) applied to a JSON payload column.

Design rules:
- JVM-side only (``get_json_object`` — whole-stage codegen, no Python
  in the hot path);
- per-record isolation: malformed JSON, missing paths, and mistyped
  values become NULL, never exceptions — one corrupt payload must not
  kill a 100-TB scan;
- one ``select`` (never a withColumn chain: Spark's case-insensitive
  resolution would silently REPLACE an existing column of the same
  name — the documented ``__N``/``__n`` trap; with select+alias a
  collision is a loud AMBIGUOUS_REFERENCE error downstream instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_json_fields(
    df: DataFrame,
    json_col: str,
    fields: "dict[str, str]",
) -> DataFrame:
    """Add one typed column per ``fields`` entry ({name: spark type}),
    extracted from the top-level JSON object in ``json_col`` via
    ``$.name`` paths. NULL on malformed JSON / absent key / failed
    cast (per-record isolation)."""
    if not fields:
        raise ValueError("fields must be non-empty")
    cols = [
        # try_cast, not cast: under ANSI mode (Spark 4 default) a
        # mistyped value would throw NumberFormatException and kill
        # the scan — try_cast gives the NULL-isolation contract
        # (DuckDB parity: TRY_CAST)
        F.get_json_object(F.col(json_col), f"$.{name}")
        .try_cast(typ)
        .alias(name)
        for name, typ in fields.items()
    ]
    return df.select("*", *cols)
