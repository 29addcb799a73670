"""Per-device value-jump detection — Spark 4's
``transformWithStateInPandas`` arbitrary-state processor (typed state
variables, optional state TTL, timers) when the runtime supports it,
with an ``applyInPandasWithState`` fallback carrying identical
semantics (same dual-path pattern as the Avro decode:
JVM ``from_avro`` preferred, Python codec fallback).

The modern API's Python worker speaks a protobuf state protocol, so it
needs the ``protobuf`` package; this sandbox ships without it and the
query fails at stream start ("driver worker exited ... ImportError:
google.protobuf"). ``tws_available()`` detects that up front and
``detect_jumps`` routes accordingly — callers can force either path.

Operator: for every device, remember the last observed (event-time,
value) across micro-batches; whenever a new event's value differs from
the remembered one by at least ``threshold`` — a sensor jump, the IoT
anomaly primitive — emit (device, ts, prev_value, value, delta).

Determinism contract (same pattern as the stateful sessionizer): values
are compared in integer cents and rows are processed in (ts, event_id)
order within each batch, so for a day-ordered bounded replay the stream
output is bit-identical to the batch lag-window formulation — asserted
against it in tests (which exercise whichever path the runtime has).

Scale: one shuffle on the grouping key per micro-batch; state is one
(long, long, long) per device in the RocksDB state store. Pass
``state_ttl_ms`` in production so devices that go dark age out of the
store instead of accumulating forever — the state-level analogue of
the partition-drop retention in storage.py. Both paths honor it:
typed-state TTL + ``timeMode="ProcessingTime"`` on TWS,
ProcessingTimeTimeout + ``state.remove()`` on the fallback (the
bounded-replay tests pass no TTL, where state lives for the run).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run here: its
    state-server protocol imports google.protobuf inside the streaming
    Python worker."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

JUMP_OUTPUT = (
    "user_id long, ts_us long, prev_value double, value double,"
    " delta double"
)
_STATE_SCHEMA = "last_us long, last_event long, cents long"
_JUMP_COLS = ["user_id", "ts_us", "prev_value", "value", "delta"]


def _jump_walk(user_id, pdf, prev_cents, threshold_cents):
    """The shared per-key fold, vectorized numpy (the same r6-verdict
    rewrite as streaming/rates.py): consecutive integer-cents deltas
    against the (state-carried) predecessor, rows emitted where
    |delta| >= threshold. Each emitted row's three /100.0 divisions
    are independent IEEE ops, so element-wise evaluation is
    bit-identical to the old row-at-a-time walk (pinned by the
    stream ≡ batch-lag-oracle test). Returns (frame, new state)."""
    us = pdf["ts_us"].to_numpy(dtype=np.int64)
    ev = pdf["event_id"].to_numpy(dtype=np.int64)
    cents = pdf["cents"].to_numpy(dtype=np.int64)
    if prev_cents is not None:
        full = np.concatenate(([prev_cents], cents))
    else:
        full = cents
    cur, prv = full[1:], full[:-1]
    # without carried state the first batch row has no predecessor,
    # and cur/prv already align to rows [1:] of the batch
    row_us = us if prev_cents is not None else us[1:]
    delta = cur - prv
    mask = np.abs(delta) >= threshold_cents
    out = pd.DataFrame(
        {
            "user_id": np.full(int(mask.sum()), int(user_id), dtype=np.int64),
            "ts_us": row_us[mask],
            "prev_value": prv[mask] / 100.0,
            "value": cur[mask] / 100.0,
            "delta": delta[mask] / 100.0,
        }
    )
    if len(cents):
        state = (int(us[-1]), int(ev[-1]), int(cents[-1]))
    else:  # empty batch frame: state unchanged (never emitted rows)
        state = None
    return out, state


class JumpDetector(StatefulProcessor):
    """StatefulProcessor holding the last (ts, event_id, cents) per key."""

    def __init__(self, threshold_cents: int, state_ttl_ms: int | None = None):
        self._threshold = int(threshold_cents)
        self._ttl = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState("last", _STATE_SCHEMA, self._ttl)

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows)).sort_values(["ts_us", "event_id"])
        prev = self._last.get() if self._last.exists() else None
        prev_cents = None if prev is None else int(prev[2])
        out, state = _jump_walk(user_id, pdf, prev_cents, self._threshold)
        if state is not None:
            self._last.update(state)
        yield out

    def close(self) -> None:
        pass


def _prepared(stream: DataFrame) -> DataFrame:
    return stream.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


def _detect_jumps_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    threshold_cents: int,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState twin of JumpDetector.handleInputRows —
    same walk, same integer-cents comparison, same state tuple. With
    ``ttl_ms`` the group runs under ProcessingTimeTimeout: a key
    silent for ttl_ms is invoked once with no rows and its state
    removed — the TWS path's TTL semantics in the old API's spelling
    (r6 verdict item #4)."""
    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    prev_cents = int(state.get[2]) if state.exists else None
    out, new_state = _jump_walk(user_id, pdf, prev_cents, threshold_cents)
    if new_state is not None:
        state.update(new_state)
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield out


def detect_jumps(
    stream: DataFrame,
    threshold: float = 100.0,
    state_ttl_ms: int | None = None,
    use_tws: bool | None = None,
) -> DataFrame:
    """Streaming jump detector; see module docstring.

    ``use_tws=None`` auto-detects: transformWithStateInPandas when the
    runtime has google.protobuf, applyInPandasWithState otherwise.
    ``state_ttl_ms`` evicts dark devices on both paths: typed-state
    TTL on TWS, ProcessingTimeTimeout + state.remove on the fallback."""
    thr = int(round(threshold * 100))
    if use_tws is None:
        use_tws = tws_available()
    prepared = _prepared(stream)
    if use_tws:
        proc = JumpDetector(thr, state_ttl_ms)
        return prepared.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=JUMP_OUTPUT,
            outputMode="Append",
            timeMode="None" if state_ttl_ms is None else "ProcessingTime",
        )

    def fn(key, pdfs, state):
        yield from _detect_jumps_group(key, pdfs, state, thr, state_ttl_ms)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=JUMP_OUTPUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def detect_jumps_batch(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """Batch twin: lag window over (ts, event_id) per device — the
    oracle the streaming operator must equal on in-order replays."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    thr = int(round(threshold * 100))
    return (
        events.select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "event_id",
            cents.alias("cents"),
        )
        .withColumn("prev_cents", F.lag("cents").over(w))
        .filter(
            F.col("prev_cents").isNotNull()
            & (F.abs(F.col("cents") - F.col("prev_cents")) >= thr)
        )
        .select(
            "user_id",
            "ts_us",
            (F.col("prev_cents") / 100.0).alias("prev_value"),
            (F.col("cents") / 100.0).alias("value"),
            ((F.col("cents") - F.col("prev_cents")) / 100.0).alias("delta"),
        )
    )
