"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming state at all (SURVEY.md §2.8); this is
the Spark-native extension point for operators the built-in windowed
aggregations can't express — here, a per-key running counter with
last-seen tracking and processing-time timeout, the canonical template
for custom session/accumulator state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events LONG, last_ts TIMESTAMP"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def running_counts(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running event counter with optional state timeout.

    Each micro-batch updates (count, last_ts) per key; expired keys
    (no data within ``timeout_ms`` of processing time) emit their final
    state and clear. State volume = one tiny tuple per key, so this
    scales to any key cardinality the state store holds.
    """

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n, last) = state.get
            state.remove()
            yield _one_row(key[0], n, last)
            return
        n, last = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf[ts_col].max()
            last = batch_max if last is None or batch_max > last else last
        state.update((n, last))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield _one_row(key[0], n, last)

    def _one_row(key, n, last):
        import pandas as pd

        return pd.DataFrame({"key": [key], "n_events": [n], "last_ts": [last]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
