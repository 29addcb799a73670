"""Continuous counter-rate (streaming/rates.py): a bounded day-ordered
replay across many small micro-batches must equal the batch
``counter_rate`` operator bit-for-bit — including the reset-recovery
deltas, zero-duration guard, and the microsecond-derived IEEE division
sequence — with the last (u, t_us) carried in state across batches.
Plus the fallback path's dark-key state eviction (r6 verdict item #4)."""

from __future__ import annotations

import os
import tempfile
import time

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.timeseries import counter_rate
from cassandra_iot_pipeline_spark.streaming.anomaly import tws_available
from cassandra_iot_pipeline_spark.streaming.pipeline import read_event_stream
from cassandra_iot_pipeline_spark.streaming.rates import (
    streaming_counter_rate,
)
from cassandra_iot_pipeline_spark.streaming.staging import stage_events_stream

SF_DIR = "/root/testdata/sf0.001"


def _key(rows):
    return sorted(
        (
            r["user_id"], r["ts_us"], r["next_ts_us"], r["delta_units"],
            r["secs"], r["rate_per_sec"],
        )
        for r in rows
    )


def test_stream_equals_batch_operator_bitwise(spark):
    staged = stage_events_stream(spark, SF_DIR)
    out_dir = tempfile.mkdtemp(prefix="rates_")
    sink_path = os.path.join(out_dir, "rates")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # small per-trigger batches force state handoff across many
        # micro-batches — the cross-batch pairing is what's under test
        q = (
            streaming_counter_rate(
                read_event_stream(spark, staged, max_files_per_trigger=8)
            )
            .writeStream.format("parquet")
            .option("path", sink_path)
            .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = _key(spark.read.parquet(sink_path).collect())
    events = load_table(spark, SF_DIR, "events")
    want = _key(counter_rate(events).collect())
    assert len(want) > 0
    assert got == want


def test_time_weight_final_rows_equal_batch(spark):
    """Continuous time-weighted avg: after a many-micro-batch bounded
    replay, each key's LAST emitted row (the one a PK-upsert table
    would serve; n_samples strictly increases per key) is bit-identical
    to the batch time_weighted_avg operator."""
    from cassandra_iot_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )
    from cassandra_iot_pipeline_spark.streaming.rates import (
        streaming_time_weighted_avg,
    )

    staged = stage_events_stream(spark, SF_DIR)
    out_dir = tempfile.mkdtemp(prefix="twa_")
    sink_path = os.path.join(out_dir, "twa")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            streaming_time_weighted_avg(
                read_event_stream(spark, staged, max_files_per_trigger=8)
            )
            .writeStream.format("parquet")
            .option("path", sink_path)
            .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    emitted = spark.read.parquet(sink_path).collect()
    latest = {}
    for r in emitted:
        cur = latest.get(r["user_id"])
        if cur is None or r["n_samples"] > cur["n_samples"]:
            latest[r["user_id"]] = r
    got = sorted(
        (r["user_id"], r["span_us"], r["n_samples"], r["tw_avg"])
        for r in latest.values()
    )
    events = load_table(spark, SF_DIR, "events")
    want = sorted(
        (r["user_id"], r["span_us"], r["n_samples"], r["tw_avg"])
        for r in time_weighted_avg(events).collect()
    )
    assert len(want) > 0
    assert got == want
    # every key emits at least once per batch it appears in — the
    # replay had many batches, so refreshes genuinely accumulated
    assert len(emitted) > len(latest)


def test_fallback_state_ttl_evicts_dark_keys(spark):
    """applyInPandasWithState path with state_ttl_ms: a key that stays
    dark past the TTL is evicted (ProcessingTimeTimeout +
    state.remove), so when it reappears its first sample anchors a
    FRESH interval instead of pairing against the stale predecessor.
    Without the TTL the same replay pairs across the silence."""

    def replay(ttl_ms):
        out_dir = tempfile.mkdtemp(prefix="rates_ttl_")
        src = os.path.join(out_dir, "src")
        os.makedirs(src)
        sink_path = os.path.join(out_dir, "sink")
        ckpt = os.path.join(out_dir, "ckpt")
        import datetime as dt

        schema = "user_id long, ts timestamp, value double"
        t0 = dt.datetime(2024, 1, 1)
        batches = [
            # key 1 appears, then goes dark
            [(1, t0, 10.0)],
            # key 2 keeps the stream busy; its batches are what drive
            # key 1's timeout processing on the fallback path
            [(2, t0 + dt.timedelta(minutes=10), 1.0)],
            # key 1 reappears BELOW its old reading — if stale state
            # survived this pairs as a reset row; if evicted, silence
            [(1, t0 + dt.timedelta(minutes=20), 5.0)],
        ]
        # a CONTINUOUS trigger, not availableNow: processing-time
        # timers are incompatible with run-to-completion triggers (the
        # engine loops "no new data but cleaning up state" batches
        # forever waiting for wall-clock timers — observed; the TTL
        # knob is for always-on serving queries, and bounded replays
        # pass no TTL)
        q = (
            streaming_counter_rate(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src + "/*"),
                state_ttl_ms=ttl_ms,
                use_tws=False,
            )
            .writeStream.format("parquet")
            .option("path", sink_path)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="250 milliseconds")
            .start()
        )

        def wait_rows(n, deadline=60.0):
            t_end = time.time() + deadline
            while time.time() < t_end:
                done = sum(
                    p["numInputRows"] for p in q.recentProgress
                )
                if done >= n:
                    return
                time.sleep(0.25)
            raise AssertionError(f"stream never consumed {n} rows")

        try:
            for i, rows in enumerate(batches):
                spark.createDataFrame(rows, schema).write.parquet(
                    os.path.join(src, f"b{i}")
                )
                wait_rows(i + 1)
                if ttl_ms is not None:
                    # let key 1's timer expire; the engine's timeout
                    # batches fire on the processing-time trigger
                    time.sleep(ttl_ms / 1000 + 1.0)
        finally:
            q.stop()
        return spark.read.parquet(sink_path).collect()

    with_ttl = replay(ttl_ms=1_000)
    assert with_ttl == []  # key 1's state was evicted while dark
    without = replay(ttl_ms=None)
    assert len(without) == 1  # stale state paired 10.0 -> 5.0 (reset)
    assert without[0]["user_id"] == 1 and without[0]["delta_units"] == 500


def test_both_paths_build_plans(spark):
    staged = stage_events_stream(spark, SF_DIR)
    stream = read_event_stream(spark, staged, max_files_per_trigger=8)
    for force in (True, False):
        df = streaming_counter_rate(stream, use_tws=force)
        assert df.isStreaming
        assert [f.name for f in df.schema.fields] == [
            "user_id", "ts_us", "next_ts_us", "delta_units", "secs",
            "rate_per_sec",
        ]
    assert isinstance(tws_available(), bool)


def test_tw_walk_overflow_raises_loudly():
    """r7 ADVICE #3: an integral numerator that leaves int64 must
    raise OverflowError (the old vectorized np.sum wrapped silently,
    emitting a wrong tw_avg where the Python-int walk would have
    failed when the value hit the long state column). Both the
    vectorized path (bound check routes to exact Python ints) and the
    carried-state accumulation are covered."""
    import numpy as np
    import pandas as pd
    import pytest

    from cassandra_iot_pipeline_spark.streaming.rates import _tw_walk

    # one batch whose exact integral exceeds int64: u ~ 9.2e14 units
    # held for ~1e9 seconds (1e15 us) -> ~9.2e29
    pdf = pd.DataFrame(
        {
            "t": np.array([0, 10**15], dtype=np.int64),
            "u": np.array([920_000_000_000_000, 1], dtype=np.int64),
        }
    )
    with pytest.raises(OverflowError, match="numerator"):
        _tw_walk(7, pdf, None, 100.0)

    # near-the-edge state + a small increment that crosses: loud too
    st = (10**15, 920_000_000_000_000, 2**63 - 1000, 10**15, 2)
    small = pd.DataFrame(
        {
            "t": np.array([10**15 + 10**9], dtype=np.int64),
            "u": np.array([1], dtype=np.int64),
        }
    )
    with pytest.raises(OverflowError, match="numerator"):
        _tw_walk(7, small, st, 100.0)

    # and a safe batch still folds exactly (vectorized path)
    ok = pd.DataFrame(
        {
            "t": np.array([0, 250_000, 1_000_000], dtype=np.int64),
            "u": np.array([1000, 3000, 3000], dtype=np.int64),
        }
    )
    row, state = _tw_walk(1, ok, None, 100.0)
    assert row == (1, 1_000_000, 3, 25.0)
    assert state == (1_000_000, 3000, 1000 * 250_000 + 3000 * 750_000, 1_000_000, 3)
