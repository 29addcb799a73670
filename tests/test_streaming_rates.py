"""Continuous counter-rate (streaming/rates.py): a bounded day-ordered
replay across many small micro-batches must equal the batch
``counter_rate`` operator bit-for-bit — including the reset-recovery
deltas, zero-duration guard, and the two-step IEEE division — with the
last (t, u, t_us) carried in state across batches."""

from __future__ import annotations

import os
import tempfile

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
        (r["user_id"], r["span_secs"], r["n_samples"], r["tw_avg"])
        for r in latest.values()
    )
    events = load_table(spark, SF_DIR, "events")
    want = sorted(
        (r["user_id"], r["span_secs"], r["n_samples"], r["tw_avg"])
        for r in time_weighted_avg(events).collect()
    )
    assert len(want) > 0
    assert got == want
    # every key emits at least once per batch it appears in — the
    # replay had many batches, so refreshes genuinely accumulated
    assert len(emitted) > len(latest)


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
