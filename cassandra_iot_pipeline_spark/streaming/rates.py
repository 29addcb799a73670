"""Continuous counter-rate — the streaming form of
``operators/timeseries.py::counter_rate``, following the stateful
dual-path pattern of the jump detector (streaming/anomaly.py):
``transformWithStateInPandas`` when the runtime has google.protobuf,
``applyInPandasWithState`` otherwise, identical semantics either way.

Operator: for every key remember the last observed (t, u, t_us) across
micro-batches; each new sample emits the interval row against its
predecessor — delta with Prometheus-style reset recovery (a reading
below its predecessor means the counter reset, and the new reading is
the interval's increase), seconds, and rate (0.0 for zero-duration
pairs, never an infinity).

Determinism contract (the engine's streaming signature move): samples
are processed in the batch operator's exact (t, u, t_us) order within
each micro-batch, units/seconds are integers, and the one IEEE
division per pair is performed in the same order as the batch plan —
so for a day-ordered bounded replay the stream output is
BIT-IDENTICAL to ``counter_rate`` on the same events, asserted in
tests/test_streaming_rates.py across many small micro-batches (state
handoff is what's under test).

Scale: one shuffle on the key per micro-batch; state is three longs
per key in the RocksDB state store; ``state_ttl_ms`` ages out dark
devices on the TWS path (same knob as the jump detector).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators import exactmath
from .anomaly import tws_available

RATE_OUTPUT = (
    "user_id long, ts_us long, next_ts_us long, delta_units long,"
    " secs long, rate_per_sec double"
)
_STATE_SCHEMA = "last_t long, last_u long, last_us long"
_COLS = ["user_id", "ts_us", "next_ts_us", "delta_units", "secs", "rate_per_sec"]


def _walk(user_id, pdf, prev, divisor):
    """The shared per-key walk: rows of (t, t_us, u) in batch order,
    ``prev`` the carried (t, u, t_us) or None. Returns (rows, state).
    Arithmetic mirrors the batch plan op-for-op: integer delta/secs,
    then float(delta)/secs/divisor — two correctly-rounded IEEE
    divisions in the same order."""
    out = []
    for t, t_us, u in zip(pdf["t"], pdf["t_us"], pdf["u"]):
        t, t_us, u = int(t), int(t_us), int(u)
        if prev is not None:
            pt, pu, pus = prev
            delta = u - pu if u >= pu else u
            secs = t - pt
            rate = float(delta) / secs / divisor if secs > 0 else 0.0
            out.append((int(user_id), pus, t_us, delta, secs, rate))
        prev = (t, u, t_us)
    return out, prev


class RateTracker(StatefulProcessor):
    """StatefulProcessor holding the last (t, u, t_us) per key."""

    def __init__(self, scale: int = 2, state_ttl_ms: int | None = None):
        self._divisor = float(10**scale)
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
        pdf = pd.concat(list(rows)).sort_values(["t", "u", "t_us"])
        prev = tuple(int(x) for x in self._last.get()) if self._last.exists() else None
        out, last = _walk(user_id, pdf, prev, self._divisor)
        self._last.update(last)
        yield pd.DataFrame(out, columns=_COLS)

    def close(self) -> None:
        pass


def _rates_group(key, pdfs, state: GroupState, divisor: float):
    """applyInPandasWithState twin of RateTracker.handleInputRows."""
    (user_id,) = key
    pdf = pd.concat(list(pdfs)).sort_values(["t", "u", "t_us"])
    prev = tuple(int(x) for x in state.get) if state.exists else None
    out, last = _walk(user_id, pdf, prev, divisor)
    state.update(last)
    yield pd.DataFrame(out, columns=_COLS)


TW_OUTPUT = "user_id long, span_secs long, n_samples long, tw_avg double"
_TW_STATE = "last_t long, last_u long, num long, span long, n long"
_TW_COLS = ["user_id", "span_secs", "n_samples", "tw_avg"]


def _tw_walk(user_id, pdf, st, divisor):
    """Running LOCF integral: fold this batch's (t, u) rows into the
    carried (last_t, last_u, num, span, n). Returns (output row, new
    state). The final division repeats the batch plan op-for-op
    (float(num)/span/divisor), so the last emitted row of a replay is
    bit-identical to ``operators/timeseries.py::time_weighted_avg``."""
    if st is None:
        last_t = last_u = None
        num = span = n = 0
    else:
        last_t, last_u, num, span, n = (int(x) for x in st)
    for t, u in zip(pdf["t"], pdf["u"]):
        t, u = int(t), int(u)
        if last_t is not None:
            num += last_u * (t - last_t)
            span += t - last_t
        n += 1
        last_t, last_u = t, u
    tw = float(num) / span / divisor if span > 0 else float(last_u) / divisor
    return (
        (int(user_id), span, n, tw),
        (last_t, last_u, num, span, n),
    )


class TimeWeightTracker(StatefulProcessor):
    """StatefulProcessor carrying the running LOCF integral per key."""

    def __init__(self, scale: int = 2, state_ttl_ms: int | None = None):
        self._divisor = float(10**scale)
        self._ttl = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("tw", _TW_STATE, self._ttl)

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows)).sort_values(["t", "u"])
        st = tuple(self._st.get()) if self._st.exists() else None
        row, new_st = _tw_walk(user_id, pdf, st, self._divisor)
        self._st.update(new_st)
        yield pd.DataFrame([row], columns=_TW_COLS)

    def close(self) -> None:
        pass


def _tw_group(key, pdfs, state: GroupState, divisor: float):
    """applyInPandasWithState twin of TimeWeightTracker."""
    (user_id,) = key
    pdf = pd.concat(list(pdfs)).sort_values(["t", "u"])
    st = tuple(state.get) if state.exists else None
    row, new_st = _tw_walk(user_id, pdf, st, divisor)
    state.update(new_st)
    yield pd.DataFrame([row], columns=_TW_COLS)


def streaming_time_weighted_avg(
    stream: DataFrame,
    scale: int = 2,
    state_ttl_ms: int | None = None,
    use_tws: bool | None = None,
) -> DataFrame:
    """Continuous LOCF time-weighted average: every micro-batch, each
    key that received samples emits its REFRESHED (span_secs,
    n_samples, tw_avg) — the live-dashboard form of
    ``time_weighted_avg``, built to land in a PK-upsert table (the
    engine's Cassandra-LWW analogue, streaming/sinks.py) where the
    newest row per key is the serving answer. n_samples strictly
    increases per emitted row of a key, so "latest" is also
    "max(n_samples)". After a day-ordered bounded replay the final row
    per key is bit-identical to the batch operator (asserted in
    tests)."""
    if use_tws is None:
        use_tws = tws_available()
    prepared = stream.filter(F.col("value").isNotNull()).select(
        "user_id",
        F.unix_timestamp(F.col("ts")).alias("t"),
        exactmath.units(F.col("value"), scale).alias("u"),
    )
    if use_tws:
        proc = TimeWeightTracker(scale, state_ttl_ms)
        return prepared.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=TW_OUTPUT,
            outputMode="Append",
            timeMode="None" if state_ttl_ms is None else "ProcessingTime",
        )
    divisor = float(10**scale)

    def fn(key, pdfs, state):
        yield from _tw_group(key, pdfs, state, divisor)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TW_OUTPUT,
        stateStructType=_TW_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_counter_rate(
    stream: DataFrame,
    scale: int = 2,
    state_ttl_ms: int | None = None,
    use_tws: bool | None = None,
) -> DataFrame:
    """Continuous counter-rate over an events stream (user_id, ts,
    value, ...); see module docstring. ``use_tws=None`` auto-detects
    the runtime's state API; the fallback has no state TTL."""
    if use_tws is None:
        use_tws = tws_available()
    prepared = stream.filter(F.col("value").isNotNull()).select(
        "user_id",
        F.unix_timestamp(F.col("ts")).alias("t"),
        F.unix_micros(F.col("ts")).alias("t_us"),
        exactmath.units(F.col("value"), scale).alias("u"),
    )
    if use_tws:
        proc = RateTracker(scale, state_ttl_ms)
        return prepared.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=RATE_OUTPUT,
            outputMode="Append",
            timeMode="None" if state_ttl_ms is None else "ProcessingTime",
        )
    divisor = float(10**scale)

    def fn(key, pdfs, state):
        yield from _rates_group(key, pdfs, state, divisor)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=RATE_OUTPUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
