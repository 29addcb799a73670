"""Stream-stream join state hygiene (streaming/joins.py).

Regression pin for the interval-form range condition: with the bound
written as unix_micros arithmetic, StreamingJoinHelper could not
extract a state-value watermark ("Failed to extract state value
watermark" in the logs) and join state was evicted only by the coarse
event-time watermark. With the native ts + INTERVAL form, Spark evicts
buffered rows as soon as the other side's watermark passes their join
window — state stays ~one window deep instead of growing with the
replay."""

from __future__ import annotations

import os
import tempfile

from cassandra_iot_pipeline_spark.streaming.joins import conversion_join_query
from cassandra_iot_pipeline_spark.streaming.pipeline import read_event_stream
from cassandra_iot_pipeline_spark.streaming.sinks import ParquetUpsertSink
from cassandra_iot_pipeline_spark.streaming.staging import stage_events_stream

SF_DIR = "/root/testdata/sf0.001"


def test_join_state_is_evicted_not_accumulated(spark):
    staged = stage_events_stream(spark, SF_DIR)
    out = tempfile.mkdtemp(prefix="ssjoin_state_")
    sink = ParquetUpsertSink(
        os.path.join(out, "conv"), pk=("view_event_id", "purchase_event_id")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # small per-trigger batches so the watermark advances many times
        q = conversion_join_query(
            read_event_stream(spark, staged, max_files_per_trigger=4),
            read_event_stream(spark, staged, max_files_per_trigger=4),
            sink,
            os.path.join(out, "ckpt"),
        )
        q.awaitTermination()
        progresses = [p for p in q.recentProgress if p["stateOperators"]]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert progresses, "no stateful progress recorded"
    last = progresses[-1]["stateOperators"][0]
    total_in = sum(p["stateOperators"][0]["numRowsUpdated"] for p in progresses)
    # eviction must actually happen across the replay...
    removed = sum(p["stateOperators"][0]["numRowsRemoved"] for p in progresses)
    assert removed > 0, "watermark never evicted any join state"
    # ...and final state must be a small fraction of everything buffered
    # (day-ordered replay, 1h join window + 1min watermark: only the
    # tail day can remain). Without state-value-watermark extraction
    # this ratio regresses toward 1.
    assert last["numRowsTotal"] < 0.5 * total_in, (
        last["numRowsTotal"],
        total_in,
    )
