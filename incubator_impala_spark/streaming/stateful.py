"""Custom stateful streaming operator: per-user sessionization via
`applyInPandasWithState` (Arrow-batched, event-time timeout).

This is the "custom stateful operator" surface the build plan calls
for (SURVEY.md §7 M6): where `session_window` covers gap-sessions
declaratively, this operator shows arbitrary per-key state machines —
the streaming analogue the reference engine has no equivalent for.

Semantics: a session closes when the event-time watermark passes
last_event_ts + gap; closed sessions are emitted with
(session_start, session_end=last_ts+gap, n_events, sum_value) —
identical to `session_window` output, so batch `session_agg` is its
oracle for all sessions the watermark has closed.

Scale: state is one small tuple per open (user) key; Arrow batches
carry each key group's rows; watermark timeout evicts state, so
memory is O(active users), not O(history).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DecimalType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DecimalType(38, 2)),
    ]
)

# state: (session_start_us, last_ts_us, n_events, sum_value_cents)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("cents", LongType()),
    ]
)

GAP_US = 6 * 3600 * 1_000_000  # 6 hours, matching the batch corpus


def _sessionize_group(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key

    if state.hasTimedOut:
        start_us, last_us, n, cents = state.get
        state.remove()
        yield _emit(user_id, start_us, last_us, n, cents)
        return

    rows = []
    for pdf in pdf_iter:
        rows.append(pdf[["ts", "value"]])
    batch = pd.concat(rows).sort_values("ts")
    ts_us = (batch["ts"].astype("int64") // 1000).tolist()
    # exact money arithmetic: cents as int64 (value has 2 decimals)
    cents_in = [round(v * 100) for v in batch["value"].tolist()]

    out = []
    if state.exists:
        start_us, last_us, n, cents = state.get
    else:
        start_us, last_us, n, cents = ts_us[0], ts_us[0], 0, 0

    for t, c in zip(ts_us, cents_in):
        if t - last_us > GAP_US:
            out.append((start_us, last_us, n, cents))
            start_us, n, cents = t, 0, 0
        last_us = max(last_us, t)
        n += 1
        cents += c

    state.update((start_us, last_us, n, cents))
    # close the session once the watermark passes last_ts + gap
    state.setTimeoutTimestamp(last_us // 1000 + GAP_US // 1000)

    for start_us_o, last_us_o, n_o, cents_o in out:
        yield _emit(user_id, start_us_o, last_us_o, n_o, cents_o)


def _emit(user_id: int, start_us: int, last_us: int, n: int,
          cents: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us + GAP_US, unit="us")],
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [Decimal(cents) / 100],
        }
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Watermarked stream -> closed sessions via per-user state."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
