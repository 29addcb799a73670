"""Custom stateful streaming operator: per-device sessionization via
``applyInPandasWithState``.

The reference's only stateful operator is the built-in windowed
aggregation (SURVEY §2.J); this module adds the *custom* stateful class
the engine needs for operators Spark's built-ins can't express: state
that evolves row-by-row per key with arbitrary Python logic, held by the
state store across micro-batches.

Semantics: a session closes when a new event arrives more than ``gap_s``
after the previous one (same rule as the batch
operators/windows.sessionize); closed sessions are emitted, the open
session stays in state. Within each micro-batch rows are processed in
event-time order; state carries (start, last, count, units) — integer
micros/cents, so emitted sessions are bit-identical to the batch
formulation for in-order replays (asserted in tests).

Scale: one shuffle on user_id per micro-batch; state is O(1) per device
(four longs), the same bound as the reference's windowed aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

# state: (session_start_us, last_ts_us, n_events, units)
SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("units", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_us, last_us, n_events, units = state.get
    else:
        start_us = last_us = None
        n_events = units = 0

    closed: list[tuple[int, int, int, int, float]] = []
    # CONCAT before the sort: a group's rows within one micro-batch
    # arrive as multiple Arrow chunks in arbitrary order (the iterator
    # chunks by maxRecordsPerBatch, not by event time). Sorting each
    # chunk independently processed chunks out of event-time order —
    # at sf0.1 this produced sessions with end < start whenever a
    # group straddled a chunk boundary; smaller fixtures passed only
    # because groups rarely straddled one.
    pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    for ts_us, cents in zip(pdf["ts_us"], pdf["cents"]):
        ts_us = int(ts_us)
        if start_us is None:
            start_us, last_us, n_events, units = ts_us, ts_us, 1, int(cents)
        elif ts_us - last_us > gap_us:
            closed.append(
                (user_id, start_us, last_us, n_events, units / 100.0)
            )
            start_us, last_us, n_events, units = ts_us, ts_us, 1, int(cents)
        else:
            last_us = ts_us
            n_events += 1
            units += int(cents)
    state.update((start_us, last_us, n_events, units))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "start_us", "end_us", "n_events", "session_value"],
        )


def streaming_sessionize(stream: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Append-mode custom stateful sessionization over an event stream
    with (user_id, ts, event_id, value) columns. Emits *closed* sessions
    only; the open session per device remains in the state store (its
    final emission belongs to the query's teardown policy — a timeout in
    production, simply unemitted for bounded replays)."""
    from pyspark.sql import functions as F

    gap_us = gap_s * 1_000_000

    prepared = stream.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_us)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
