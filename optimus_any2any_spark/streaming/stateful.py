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


FUNNEL_STATE_SCHEMA = "t1 LONG, t2 LONG, t3 LONG"
FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("furthest_step", T.IntegerType()),
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
    ]
)


def funnel_state(
    stream: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    window_us: int = 24 * 3600 * 1_000_000,
) -> DataFrame:
    """Streaming twin of ``q_events_funnel``: per-user ordered funnel
    state (step timestamps in epoch-us) evolved across micro-batches.

    Semantics = the batch funnel applied incrementally: step 1 is the
    earliest first-step event seen so far (refined downward only while
    step 2 is unset), each later step must strictly follow the previous
    one within ``window_us``, and a completed step is FROZEN — a
    late-arriving earlier event no longer rewrites history (the
    standard streaming relaxation; the batch query is the exact oracle
    over a closed dataset). Within a batch, events apply in timestamp
    order, so any in-order replay matches the batch result.

    Emits ``(user_id, furthest_step, t1, t2, t3)`` per updated user.
    State is one 3-long tuple per user — state-store volume is O(users)
    regardless of event volume.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        t1, t2, t3 = state.get if state.exists else (None, None, None)
        events: list[tuple[str, int]] = []
        for pdf in pdfs:
            # a null ts would coerce NaT -> int64 min and poison the
            # ordering; a timestamp-less event can't enter a time chain
            pdf = pdf[pdf[ts_col].notna()]
            us = (
                pdf[ts_col]
                .astype("datetime64[us]")
                .astype("int64")
                .tolist()
            )
            events.extend(zip(pdf[type_col].tolist(), us))
        for typ, u in sorted(events, key=lambda e: e[1]):
            if typ == steps[0] and t2 is None:
                t1 = u if t1 is None or u < t1 else t1
            elif typ == steps[1] and t2 is None and t1 is not None:
                if u > t1 and u - t1 <= window_us:
                    t2 = u
            elif typ == steps[2] and t3 is None and t2 is not None:
                if u > t2 and u - t2 <= window_us:
                    t3 = u
        state.update((t1, t2, t3))
        step = 3 if t3 is not None else (
            2 if t2 is not None else (1 if t1 is not None else 0)
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "furthest_step": [step],
                "t1": [t1],
                "t2": [t2],
                "t3": [t3],
            }
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
