"""Custom stateful streaming operators via applyInPandasWithState.

The reference's agent/event layer implies long-lived per-key state
(AGENTS.md:131-132 ``WAIT FOR EVENT``; DISTRIBUTED.md training
coordination rows). The Spark-native form is
``applyInPandasWithState``: per-key state object + Arrow-batched
updates + timeout-driven finalization.

``streaming_sessionize`` is the canonical instance: per-user session
aggregation where a session closes after ``gap`` seconds of silence
(processing-time timeout). The batch equivalent (events_sessionize
query) is oracle-checked; this operator is the infinite-stream form —
state per user is O(1) (current session aggregate), so 10⁹ users is
10⁹ tiny state rows sharded across executors.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, start_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64")  # ns → handled below
        # pandas datetime64[ns|us] → microseconds
        if rows["ts"].dtype.kind == "M":
            ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
        closed = []
        if state.exists:
            n, total, start_us, last_us = state.get
        else:
            n, total, start_us, last_us = 0, 0.0, None, None
        for t_us, value in zip(ts_us, rows["value"].fillna(0.0)):
            if last_us is not None and t_us - last_us > gap_us:
                closed.append((user_id, n, total, start_us, last_us))
                n, total, start_us = 0, 0.0, None
            if start_us is None:
                start_us = int(t_us)
            n += 1
            total += float(value)
            last_us = int(t_us)
        state.update((n, total, start_us, last_us))
        state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "total_value": [c[2] for c in closed],
                    "session_start": [pd.Timestamp(c[3], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[4], unit="us") for c in closed],
                }
            )

    return update


def streaming_sessionize(
    events_stream: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Stateful sessionization over a streaming events frame
    (columns: user_id, ts, value)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
