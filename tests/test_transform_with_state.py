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
