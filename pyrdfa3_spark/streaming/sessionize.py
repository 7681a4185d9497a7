"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the Structured Streaming escape hatch for
operators the built-in windowing can't express).

State per user: the open session (start_ms, last_ms, n_events).  A new
event more than ``gap_ms`` after the last closes the open session
(emitted) and starts a new one.  The final open session per user stays
in the state store — it is emitted by a later micro-batch or on state
timeout, standard streaming-sessionization semantics.  Consistency with
the batch variant (plans/queries.q_sessionize) is asserted in tests:
streamed closed sessions == batch sessions minus each user's last.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType,
)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_ms", LongType()),
    StructField("session_end_ms", LongType()),
    StructField("n_events", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("start_ms", LongType()),
    StructField("last_ms", LongType()),
    StructField("n_events", LongType()),
])

DEFAULT_GAP_MS = 30 * 60 * 1000


def _make_session_fn(gap_ms: int):
    def fn(key: Tuple[Any], batches: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_ms, last_ms, n_events = state.get
        else:
            start_ms = last_ms = None
            n_events = 0
        closed = []
        events = []
        for pdf in batches:
            events.extend(int(v) for v in pdf["ms"])
        events.sort()
        for ms in events:
            if start_ms is None:
                start_ms, last_ms, n_events = ms, ms, 1
            elif ms - last_ms > gap_ms:
                closed.append((user_id, start_ms, last_ms, n_events))
                start_ms, last_ms, n_events = ms, ms, 1
            else:
                last_ms = ms
                n_events += 1
        state.update((start_ms, last_ms, n_events))
        if closed:
            yield pd.DataFrame(closed, columns=[
                "user_id", "session_start_ms", "session_end_ms", "n_events"])

    return fn


def sessionize_stream(events: DataFrame,
                      gap_ms: int = DEFAULT_GAP_MS) -> DataFrame:
    """events stream (user_id, ts, ...) -> closed-session stream."""
    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_millis(F.col("ts").cast("timestamp_ltz")).alias("ms"))
    return (prepared.groupBy("user_id")
            .applyInPandasWithState(
                _make_session_fn(gap_ms),
                outputStructType=SESSION_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
