"""Custom stateful streaming operators (applyInPandasWithState).

``streaming_dedup`` — exactly-once-per-key emission across micro-
batches: the first row per key passes, replays are dropped, keyed state
remembers seen keys with a processing-time TTL. This is the streaming
generalization of the engine's anti-join resume (SURVEY J3): where the
batch path prunes against the persisted output, the streaming path
prunes against keyed state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "key string, first_ts timestamp, n_dropped bigint"
DEDUP_STATE_SCHEMA = "seen boolean, n_dropped bigint"


def streaming_dedup(
    events: DataFrame,
    key_col: str = "image_id",
    ts_col: str = "ts",
    ttl_minutes: int = 0,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Keep the first occurrence of each key; count dropped replays in
    state. Emits one row per key on first sight only. ``carry_cols``
    additionally emits the first-seen row's values for those columns
    (the representative survives — e.g. the winning image_id when
    deduping on a perceptual-hash key). The output ``key`` column takes
    the input key's type (hash keys are bigint, not string)."""
    carry = list(carry_cols)
    in_schema = events.schema
    out_schema = T.StructType(
        [
            T.StructField("key", in_schema[key_col].dataType),
            T.StructField("first_ts", in_schema[ts_col].dataType),
            T.StructField("n_dropped", T.LongType()),
        ]
        + [T.StructField(c, in_schema[c].dataType) for c in carry]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry invocation (no input rows): drop the keyed
            # state so it does not grow unboundedly.
            state.remove()
            return iter(())
        first_ts = None
        first_row = None
        total = 0
        for pdf in pdfs:
            total += len(pdf)
            if len(pdf):
                idx = pdf[ts_col].idxmin()
                ts = pdf[ts_col].loc[idx]
                if first_ts is None or ts < first_ts:
                    first_ts = ts
                    first_row = pdf.loc[idx, carry] if carry else None
        if state.exists:
            seen, dropped = state.get
            state.update((True, dropped + total))
            if ttl_minutes:
                # sliding TTL: each replay re-arms the timeout
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            return iter(())  # replay: emit nothing
        state.update((True, max(total - 1, 0)))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        out = {"key": [key[0]], "first_ts": [first_ts],
               "n_dropped": [max(total - 1, 0)]}
        for c in carry:
            out[c] = [first_row[c]]
        return iter([pd.DataFrame(out)])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, DEDUP_STATE_SCHEMA, "append", timeout
        )
    )


def streaming_enrich_asof(
    left: DataFrame,
    right: DataFrame,
    key: str = "entity_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming analog of the engine's core as-of join (SURVEY J8):
    enrich a left event stream with the most recent right value at or
    before each event's timestamp, per key.

    Semantics: within a micro-batch the match is an EXACT as-of (both
    sides are unioned with a side tag and walked in (ts, side) order —
    the same construction as the batch operator, operators/asof.py);
    across micro-batches the keyed state carries the latest right row
    seen so far, so matching is exact under in-order arrival and
    latest-known-value under out-of-order arrival (a right row that
    arrives in a later batch than a left event it should have matched
    cannot retro-emit — standard streaming enrich semantics; use the
    batch as-of for reprocessing).

    State per key: (last_ts, last_val) — O(1), no event buffering.
    """
    import pandas as pd  # noqa: F811 (local for executor pickling)

    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            left.schema[id_col],
            left.schema[key],
            left.schema[left_ts],
            T.StructField("matched_value", right.schema[value_col].dataType, True),
            T.StructField("matched_ts", right.schema[right_ts].dataType, True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_ts", right.schema[right_ts].dataType, True),
            T.StructField("last_val", right.schema[value_col].dataType, True),
        ]
    )

    l_tag = left.select(
        F.col(key), F.col(left_ts).alias("__ts"), F.col(id_col).alias("__id"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("__val"),
        F.lit(1).alias("__side"),
    )
    r_tag = right.select(
        F.col(key), F.col(right_ts).alias("__ts"),
        F.lit(None).cast(left.schema[id_col].dataType).alias("__id"),
        F.col(value_col).alias("__val"), F.lit(0).alias("__side"),
    )
    u = l_tag.unionByName(r_tag)

    id_name, key_name, ts_name = id_col, key, left_ts

    def fn(k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return iter(())
        last_ts, last_val = state.get if state.exists else (None, None)
        out_id, out_ts, out_v, out_mts = [], [], [], []
        # a key's micro-batch may arrive as MULTIPLE Arrow chunks in
        # arbitrary order — concat before sorting or the within-batch
        # as-of is only exact per chunk
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            # right rows before left rows at equal ts -> inclusive <=
            whole = whole.sort_values(["__ts", "__side"], kind="mergesort")
            for ts, iid, val, side in zip(
                whole["__ts"], whole["__id"], whole["__val"], whole["__side"]
            ):
                if side == 0:
                    if last_ts is None or ts >= last_ts:
                        last_ts, last_val = ts, val
                else:
                    hit = last_ts is not None and last_ts <= ts
                    out_id.append(iid)
                    out_ts.append(ts)
                    out_v.append(last_val if hit else None)
                    out_mts.append(last_ts if hit else None)
        if last_ts is not None:
            state.update((last_ts, last_val))
        if not out_id:
            return iter(())
        return iter(
            [pd.DataFrame({
                id_name: out_id,
                key_name: [k[0]] * len(out_id),
                ts_name: out_ts,
                "matched_value": out_v,
                "matched_ts": out_mts,
            })]
        )

    return u.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_sessionize(
    events: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming gap-based sessionization — the online form of
    ``operators.windows.sessionize`` (north_rule W8): a new session
    starts when the gap to the entity's previous event exceeds
    ``gap_seconds``; session_id is the 0-based running boundary count
    per entity. Keyed state carries (last event epoch, current
    session index) across micro-batches, so the id sequence over an
    in-order stream is IDENTICAL to the batch operator's — the parity
    test replays the same events through both paths.

    Assumes event-time-ordered arrival per entity (the same contract
    as the batch cumsum — a late row would extend the session it
    lands in, not rewrite history; enforce upstream with a watermark
    + sort within the micro-batch source if needed). Rows within one
    micro-batch are sorted by event time before gap evaluation.

    Emits every event with its session id (append mode)."""
    in_schema = events.schema
    # entity/ts types come from the input (the streaming_dedup rule:
    # numeric entity ids must not be silently stringified)
    out_schema = T.StructType(
        [
            T.StructField(entity_col, in_schema[entity_col].dataType),
            T.StructField(ts_col, in_schema[ts_col].dataType),
            T.StructField("session_id", T.LongType()),
        ]
    )
    state_schema = "last_epoch bigint, session bigint"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no TTL configured
            state.remove()
            return iter(())
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return iter(())
        rows = rows.sort_values(ts_col, kind="mergesort")
        if state.exists:
            last_epoch, session = state.get
        else:
            last_epoch, session = None, 0
        epochs = (
            rows[ts_col].astype("datetime64[ns]").astype("int64") // 10**9
        )
        out_sessions = []
        for e in epochs:
            e = int(e)
            if last_epoch is not None and e - last_epoch > gap_seconds:
                session += 1
            out_sessions.append(session)
            last_epoch = e
        state.update((last_epoch, session))
        yield pd.DataFrame(
            {
                entity_col: rows[entity_col].values,
                ts_col: rows[ts_col].values,
                "session_id": out_sessions,
            }
        )

    return (
        events.select(entity_col, ts_col)
        .groupBy(entity_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_bloom_gate(
    events: DataFrame,
    bloom_words: "list[int]",
    key_col: str = "image_id",
    m_bits: int = 8192,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Stateless streaming pre-screen against a STATIC bloom filter
    (the historical-corpus membership sketch): rows whose key the
    filter definitely has not seen pass straight through with
    ``maybe_seen`` = 0; the MAYBE rows carry 1 and are what a
    downstream exact check (streaming_dedup or a keyed lookup) must
    resolve. This is the classic two-stage ingest gate: the bloom
    probe is a row-local O(k) bitmap test inside the stream (no state,
    no shuffle, survives any trigger interval), so the expensive exact
    stage only sees the tiny maybe fraction.

    ``bloom_words`` is the pre-folded int64 bitmap word list (as built
    from sketch.bloom_build positions via sketch.bloom_probe's word
    fold) — ship the few-KB literal, never the key set. Parameters
    must match the filter's build."""
    from ..operators.sketch import _bloom_pos

    warr = F.array(*[F.lit(int(w)).cast("long") for w in bloom_words])
    hit = None
    for j in range(k):
        pos = _bloom_pos(F.col(key_col), j, m_bits, salt)
        word = F.element_at(
            warr, (F.shiftrightunsigned(pos, 6) + 1).cast("int")
        )
        b = F.bit_get(word, pos.bitwiseAND(F.lit(63)))
        hit = b if hit is None else hit * b
    return events.withColumn(
        "maybe_seen", F.coalesce(hit.cast("int"), F.lit(0))
    )


def bloom_words_from_positions(positions: "list[int]", m_bits: int) -> "list[int]":
    """Fold a position table (bloom_build output, collected) into the
    signed int64 bitmap word list stream_bloom_gate ships."""
    n_words = (m_bits + 63) // 64
    words = [0] * n_words
    for p in positions:
        words[int(p) >> 6] |= 1 << (int(p) & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]
