"""Stateful jump detector (streaming/anomaly.py): bounded day-ordered
replay must equal the batch lag-window oracle bit-for-bit, with state
carried across micro-batches. Runs whichever state API the runtime
supports (transformWithStateInPandas needs google.protobuf; this
sandbox exercises the applyInPandasWithState fallback)."""

from __future__ import annotations

import os
import tempfile

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.streaming.anomaly import (
    detect_jumps,
    detect_jumps_batch,
    tws_available,
)
from cassandra_iot_pipeline_spark.streaming.pipeline import read_event_stream
from cassandra_iot_pipeline_spark.streaming.staging import stage_events_stream

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 120.0


def _key(rows):
    return sorted(
        (r["user_id"], r["ts_us"], r["prev_value"], r["value"], r["delta"])
        for r in rows
    )


def test_stream_equals_batch_lag_oracle(spark):
    staged = stage_events_stream(spark, SF_DIR)
    out_dir = tempfile.mkdtemp(prefix="jumps_")
    sink_path = os.path.join(out_dir, "jumps")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # small per-trigger batches force state handoff across many
        # micro-batches — the cross-batch memory is what's under test
        q = (
            detect_jumps(
                read_event_stream(spark, staged, max_files_per_trigger=8),
                THRESHOLD,
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
    want = _key(detect_jumps_batch(events, THRESHOLD).collect())
    assert len(want) > 0, "threshold too high: oracle found no jumps"
    assert got == want


def test_both_paths_build_plans(spark):
    """Plan construction must work for BOTH state APIs regardless of
    runtime support (only execution needs protobuf for TWS); the
    detector auto-routes on tws_available()."""
    staged = stage_events_stream(spark, SF_DIR)
    stream = read_event_stream(spark, staged, max_files_per_trigger=8)
    for force in (True, False):
        df = detect_jumps(stream, THRESHOLD, use_tws=force)
        assert df.isStreaming
        assert [f.name for f in df.schema.fields] == [
            "user_id", "ts_us", "prev_value", "value", "delta",
        ]
    assert isinstance(tws_available(), bool)


def test_fallback_state_ttl_evicts_dark_devices(spark):
    """r6 verdict item #4 on the jump detector's fallback path: a
    device dark past state_ttl_ms is evicted (ProcessingTimeTimeout +
    state.remove), so its reappearing reading anchors fresh instead of
    comparing against the stale remembered value. A continuous
    trigger, not availableNow — processing-time timers are
    incompatible with run-to-completion triggers (see
    streaming/rates.py docstring)."""
    import datetime as dt
    import time

    def replay(ttl_ms):
        out_dir = tempfile.mkdtemp(prefix="jumps_ttl_")
        src = os.path.join(out_dir, "src")
        os.makedirs(src)
        sink_path = os.path.join(out_dir, "sink")
        schema = (
            "user_id long, ts timestamp, event_id long, value double"
        )
        t0 = dt.datetime(2024, 1, 1)
        batches = [
            [(1, t0, 1, 10.0)],
            [(2, t0 + dt.timedelta(minutes=10), 2, 1.0)],
            # a 500.0 jump vs the stale 10.0 — emitted only if key 1's
            # state survived the dark period
            [(1, t0 + dt.timedelta(minutes=20), 3, 510.0)],
        ]
        q = (
            detect_jumps(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src + "/*"),
                threshold=THRESHOLD,
                state_ttl_ms=ttl_ms,
                use_tws=False,
            )
            .writeStream.format("parquet")
            .option("path", sink_path)
            .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
            .outputMode("append")
            .trigger(processingTime="250 milliseconds")
            .start()
        )

        def wait_rows(n, deadline=60.0):
            t_end = time.time() + deadline
            while time.time() < t_end:
                if sum(p["numInputRows"] for p in q.recentProgress) >= n:
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
                    time.sleep(ttl_ms / 1000 + 1.0)
        finally:
            q.stop()
        return spark.read.parquet(sink_path).collect()

    assert replay(ttl_ms=1_000) == []  # evicted: no stale comparison
    without = replay(ttl_ms=None)
    assert len(without) == 1 and without[0]["delta"] == 500.0
