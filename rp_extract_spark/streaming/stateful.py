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
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "key string, first_ts timestamp, n_dropped bigint"
DEDUP_STATE_SCHEMA = "seen boolean, n_dropped bigint"


def streaming_dedup(
    events: DataFrame,
    key_col: str = "image_id",
    ts_col: str = "ts",
    ttl_minutes: int = 0,
) -> DataFrame:
    """Keep the first occurrence of each key; count dropped replays in
    state. Emits one row per key on first sight only."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry invocation (no input rows): drop the keyed
            # state so it does not grow unboundedly.
            state.remove()
            return iter(())
        first_ts = None
        total = 0
        for pdf in pdfs:
            total += len(pdf)
            if first_ts is None and len(pdf):
                first_ts = pdf[ts_col].min()
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
        return iter(
            [pd.DataFrame({"key": [key[0]], "first_ts": [first_ts],
                           "n_dropped": [max(total - 1, 0)]})]
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, DEDUP_OUT_SCHEMA, DEDUP_STATE_SCHEMA, "append", timeout
        )
    )
