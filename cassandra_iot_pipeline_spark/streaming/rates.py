"""Continuous counter-rate — the streaming form of
``operators/timeseries.py::counter_rate``, following the stateful
dual-path pattern of the jump detector (streaming/anomaly.py):
``transformWithStateInPandas`` when the runtime has google.protobuf,
``applyInPandasWithState`` otherwise, identical semantics either way.

Operator: for every key remember the last observed (u, t_us) across
micro-batches; each new sample emits the interval row against its
predecessor — delta with Prometheus-style reset recovery (a reading
below its predecessor means the counter reset, and the new reading is
the interval's increase), microsecond-derived seconds, and rate (0.0
for identical-microsecond pairs, never an infinity).

Determinism contract (the engine's streaming signature move): samples
are processed in the batch operator's exact (t_us, u) order within
each micro-batch, units/microseconds are integers, and the IEEE
divisions per pair are performed in the same order as the batch plan
— so for a day-ordered bounded replay the stream output is
BIT-IDENTICAL to ``counter_rate`` on the same events, asserted in
tests/test_streaming_rates.py across many small micro-batches (state
handoff is what's under test).

The per-key folds are vectorized numpy (r6 verdict item #2): each
pair's delta/secs/rate arithmetic is independent of every other
pair's, so element-wise ``shift``/``where`` evaluation performs the
exact same IEEE ops in the exact same per-pair order as the old
row-at-a-time Python walk — bit parity is pinned by the stream≡batch
tests — while a hot key receiving a large micro-batch costs numpy
array ops instead of a Python loop. The time-weighted integral's
running sums are integer (associative), so vectorized summation is
exactly the loop's result too.

Scale: one shuffle on the key per micro-batch; state is 2 (rate) or 5
(integral) longs per key in the RocksDB state store; ``state_ttl_ms``
ages out dark devices on BOTH paths — typed-state TTL on the TWS
path, ProcessingTimeTimeout eviction on the applyInPandasWithState
fallback (r6 verdict item #4: the fallback previously accumulated
dark-key state forever).

Trigger compatibility: pass ``state_ttl_ms`` only on always-on
queries (processingTime triggers — the serving posture the knob
exists for). Processing-time timers are incompatible with
run-to-completion triggers: under ``availableNow`` the engine loops
"no new data but cleaning up state" batches forever waiting for
wall-clock timers that the drained replay will never outlive
(observed on this runtime; the bounded-replay tests pass no TTL).
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

from ..operators import exactmath
from .anomaly import tws_available

RATE_OUTPUT = (
    "user_id long, ts_us long, next_ts_us long, delta_units long,"
    " secs double, rate_per_sec double"
)
_STATE_SCHEMA = "last_u long, last_us long"
_COLS = ["user_id", "ts_us", "next_ts_us", "delta_units", "secs", "rate_per_sec"]


def _walk(user_id, pdf, prev, divisor):
    """The shared per-key fold: rows of (t_us, u) in batch order,
    ``prev`` the carried (u, t_us) or None. Returns (frame, state).
    Arithmetic mirrors the batch plan op-for-op, vectorized: integer
    delta and microsecond duration, then the three IEEE ops
    (int→double /1e6 for secs, delta/secs, /divisor) element-wise —
    per-pair op order identical to the batch plan's projection."""
    us = pdf["t_us"].to_numpy(dtype=np.int64)
    u = pdf["u"].to_numpy(dtype=np.int64)
    if prev is not None:
        pu0, pus0 = (int(x) for x in prev)
        us = np.concatenate(([pus0], us))
        u = np.concatenate(([pu0], u))
    if len(us) < 2:
        out = pd.DataFrame(
            {c: np.array([], dtype=np.float64 if c in ("secs", "rate_per_sec") else np.int64) for c in _COLS}
        )
        return out, (int(u[-1]), int(us[-1]))
    pu, cu = u[:-1], u[1:]
    pus, cus = us[:-1], us[1:]
    delta = np.where(cu >= pu, cu - pu, cu)
    dus = cus - pus
    secs = dus.astype(np.float64) / 1e6
    with np.errstate(divide="ignore", invalid="ignore"):
        rate = np.where(
            dus > 0, delta.astype(np.float64) / secs / divisor, 0.0
        )
    out = pd.DataFrame(
        {
            "user_id": np.full(len(delta), int(user_id), dtype=np.int64),
            "ts_us": pus,
            "next_ts_us": cus,
            "delta_units": delta.astype(np.int64),
            "secs": secs,
            "rate_per_sec": rate,
        }
    )
    return out, (int(u[-1]), int(us[-1]))


class RateTracker(StatefulProcessor):
    """StatefulProcessor holding the last (u, t_us) per key."""

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
        pdf = pd.concat(list(rows)).sort_values(["t_us", "u"])
        prev = tuple(int(x) for x in self._last.get()) if self._last.exists() else None
        out, last = _walk(user_id, pdf, prev, self._divisor)
        self._last.update(last)
        yield out

    def close(self) -> None:
        pass


def _rates_group(
    key, pdfs, state: GroupState, divisor: float, ttl_ms: int | None = None
):
    """applyInPandasWithState twin of RateTracker.handleInputRows.
    With ``ttl_ms`` the group runs under ProcessingTimeTimeout: a key
    silent for ttl_ms is invoked once with no rows and its state
    removed (the TWS path's TTL semantics, old-API spelling)."""
    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    pdf = pd.concat(list(pdfs)).sort_values(["t_us", "u"])
    prev = tuple(int(x) for x in state.get) if state.exists else None
    out, last = _walk(user_id, pdf, prev, divisor)
    state.update(last)
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield out


TW_OUTPUT = "user_id long, span_us long, n_samples long, tw_avg double"
_TW_STATE = "last_t long, last_u long, num long, span long, n long"
_TW_COLS = ["user_id", "span_us", "n_samples", "tw_avg"]

_INT64_MAX = 2**63 - 1


def _tw_walk(user_id, pdf, st, divisor):
    """Running LOCF integral at the microsecond grain: fold this
    batch's (t, u) rows into the carried (last_t, last_u, num, span,
    n), vectorized — the integral increments are integer products
    (exact, associative: the numpy sum IS the loop's result), and the
    final division repeats the batch plan op-for-op
    (float(num)/float(span)/divisor), so the last emitted row of a
    replay is bit-identical to
    ``operators/timeseries.py::time_weighted_avg``.

    Overflow posture (r7 ADVICE #3): the state column holds ``num``
    as int64, so the streaming form's envelope is
    |sum(u x dus)| < 2^63 per key (~scale-2 values of 2,900 sustained
    over a decade); the batch operator's DECIMAL(38,0) numerator
    extends beyond it. Inside a batch, a cheap exact bound
    (max|u| x max(dus) x n_pairs) guards the vectorized int64 sum —
    when it could wrap, the fold recomputes with Python ints (exact)
    — and breaching int64 raises OverflowError LOUDLY instead of the
    silent np.int64 wrap-around."""
    if st is None:
        last_t = last_u = None
        num = span = n = 0
    else:
        last_t, last_u, num, span, n = (int(x) for x in st)
    t = pdf["t"].to_numpy(dtype=np.int64)
    u = pdf["u"].to_numpy(dtype=np.int64)
    if last_t is not None:
        t = np.concatenate(([last_t], t))
        u = np.concatenate(([last_u], u))
    if len(t) >= 2:
        diffs = t[1:] - t[:-1]
        head = u[:-1]
        bound = int(np.max(np.abs(head))) * int(np.max(diffs)) * len(diffs)
        if bound <= _INT64_MAX:
            num += int(np.sum(head * diffs, dtype=np.int64))
        else:  # exact, unbounded — only the rare near-wrap batch pays it
            num += sum(
                int(a) * int(b)
                for a, b in zip(head.tolist(), diffs.tolist())
            )
        if not -_INT64_MAX - 1 <= num <= _INT64_MAX:
            raise OverflowError(
                "streaming_time_weighted_avg: integral numerator "
                f"{num} exceeds the int64 state column for key "
                f"{user_id} — the units x microseconds envelope is "
                "documented in _tw_walk; use the batch operator's "
                "decimal numerator for spans/values this hot"
            )
        span += int(t[-1] - t[0])
    n += len(pdf)
    last_t, last_u = int(t[-1]), int(u[-1])
    tw = (
        float(num) / float(span) / divisor
        if span > 0
        else float(last_u) / divisor
    )
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


def _tw_group(
    key, pdfs, state: GroupState, divisor: float, ttl_ms: int | None = None
):
    """applyInPandasWithState twin of TimeWeightTracker (same
    ProcessingTimeTimeout eviction contract as _rates_group)."""
    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    pdf = pd.concat(list(pdfs)).sort_values(["t", "u"])
    st = tuple(state.get) if state.exists else None
    row, new_st = _tw_walk(user_id, pdf, st, divisor)
    state.update(new_st)
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame([row], columns=_TW_COLS)


def streaming_time_weighted_avg(
    stream: DataFrame,
    scale: int = 2,
    state_ttl_ms: int | None = None,
    use_tws: bool | None = None,
) -> DataFrame:
    """Continuous LOCF time-weighted average: every micro-batch, each
    key that received samples emits its REFRESHED (span_us,
    n_samples, tw_avg) — the live-dashboard form of
    ``time_weighted_avg``, built to land in a PK-upsert table (the
    engine's Cassandra-LWW analogue, streaming/sinks.py) where the
    newest row per key is the serving answer. n_samples strictly
    increases per emitted row of a key, so "latest" is also
    "max(n_samples)". Integrates at the MICROSECOND grain like the r8
    batch operator; after a day-ordered bounded replay the final row
    per key is bit-identical to it within the int64 numerator
    envelope (see _tw_walk — breaching it raises loudly). ``state_ttl_ms``
    evicts dark keys on both runtime paths."""
    if use_tws is None:
        use_tws = tws_available()
    prepared = stream.filter(F.col("value").isNotNull()).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("t"),
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
        yield from _tw_group(key, pdfs, state, divisor, state_ttl_ms)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TW_OUTPUT,
        stateStructType=_TW_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def streaming_counter_rate(
    stream: DataFrame,
    scale: int = 2,
    state_ttl_ms: int | None = None,
    use_tws: bool | None = None,
) -> DataFrame:
    """Continuous counter-rate over an events stream (user_id, ts,
    value, ...); see module docstring. ``use_tws=None`` auto-detects
    the runtime's state API; ``state_ttl_ms`` evicts dark keys on
    both paths (typed-state TTL / ProcessingTimeTimeout)."""
    if use_tws is None:
        use_tws = tws_available()
    prepared = stream.filter(F.col("value").isNotNull()).select(
        "user_id",
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
        yield from _rates_group(key, pdfs, state, divisor, state_ttl_ms)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=RATE_OUTPUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
