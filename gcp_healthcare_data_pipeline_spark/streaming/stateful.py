"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for operators Structured Streaming's built-in windows
can't express: arbitrary per-key state evolved across micro-batches with
Arrow-batched Python. Demonstrated here as a per-user running profile
(event count, value total, last-seen event time) that re-emits the
updated profile every micro-batch — the streaming twin of a running
groupBy, but with user-defined state transitions.

State is partitioned by key across executors and checkpointed by the
engine; at 100 TB of events the operator scales with the number of
distinct keys per executor, not the stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("last_ts_us", LongType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
        StructField("last_ts_us", LongType(), True),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # pyspark's state serializer trips a noisy pandas concat FutureWarning
    # on every batch; silence it worker-side
    import warnings  # noqa: PLC0415 (runs on executors)

    warnings.filterwarnings("ignore", category=FutureWarning)
    n, total, last_ts = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_ts = max(last_ts, int(pdf["ts_us"].max()))
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts_us": [last_ts],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile over a stream with ``user_id``, ``value``,
    and ``ts_us`` columns; emits the updated profile each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- event-time-timeout variant: emit ONLY when a key's state expires ----

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)


def _close_on_timeout(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate silently; emit one final row per key when the
    event-time watermark passes the key's timeout — the flush-on-expiry
    shape (per-key sessionization, TTL'd caches, abandoned-cart
    emission) that ``update``-every-batch operators can't express."""
    import warnings  # noqa: PLC0415 (runs on executors)

    warnings.filterwarnings("ignore", category=FutureWarning)
    if state.hasTimedOut:
        n, total, _last = state.get if state.exists else (0, 0.0, 0)
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )
        return
    n, total, last_ts = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_ts = max(last_ts, int(pdf["ts_us"].max()))
    state.update((n, total, last_ts))
    # expire once the watermark passes the last event + 1ms: for a
    # bounded drain every key eventually times out and emits exactly once
    state.setTimeoutTimestamp(last_ts // 1000 + 1)
    yield from ()


def profiles_on_timeout(events: DataFrame) -> DataFrame:
    """Flush-on-expiry per-user totals: requires a watermarked
    ``event_time`` column; each key emits exactly one summary row when
    its event-time timeout fires (for a bounded stream: at end-of-input,
    when the final watermark passes every timeout)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _close_on_timeout,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
