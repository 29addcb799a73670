"""End-to-end facade test: the reference user's workflow on this engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.api import IoTEngine
from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.agg import hourly_rollup
from cassandra_iot_pipeline_spark.streaming.staging import stage_events_stream
from tests.conftest import SF_DIR


def test_full_reference_workflow(spark, tmp_path):
    engine = IoTEngine(spark, str(tmp_path / "warehouse"))
    staged = stage_events_stream(spark, SF_DIR, base_dir=str(tmp_path / "staging"))
    engine.ingest_stream(staged)

    events = load_table(spark, SF_DIR, "events")
    counts = engine.table_counts()
    assert counts["sensor_events"] == events.count()
    assert counts["hourly_aggregates"] == hourly_rollup(events).count()

    # the latency-probe read
    latest = engine.latest_events(device_id=13, limit=10).collect()
    assert 0 < len(latest) <= 10
    assert all(r.user_id == 13 for r in latest)
    ts_list = [r.ts for r in latest]
    assert ts_list == sorted(ts_list, reverse=True)

    # dashboard read, newest bucket first
    hourly = engine.hourly_aggregates(device_id=13).collect()
    assert len(hourly) > 0
    buckets = [r.hour_bucket for r in hourly]
    assert buckets == sorted(buckets, reverse=True)

    # range read subsets the dashboard read
    lo, hi = buckets[-1], buckets[0]
    full = engine.device_hourly_range(13, lo, hi).count()
    assert full == len(buckets)

    # re-ingesting the same data is idempotent (PK upsert)
    engine.ingest_batch(events, epoch_id=99)
    counts2 = engine.table_counts()
    assert counts2 == counts

    # compaction preserves the reconciled view and shrinks the log
    stats_before = {r.table: r.n_files for r in engine.table_stats().collect()}
    engine.compact()
    stats_after = {r.table: r.n_files for r in engine.table_stats().collect()}
    assert engine.table_counts() == counts
    assert stats_after["sensor_events"] <= stats_before["sensor_events"]


def test_batch_only_ingest(spark, tmp_path):
    engine = IoTEngine(spark, str(tmp_path / "wh2"))
    events = load_table(spark, SF_DIR, "events")
    engine.ingest_batch(events)
    assert engine.table_counts()["sensor_events"] == events.count()
    # aggregates match the batch rollup exactly
    got = sorted(
        map(tuple, engine.hourly().select(
            "device_id", "hour_bucket", "avg_value", "max_value",
            "min_value", "event_count").collect())
    )
    want = sorted(map(tuple, hourly_rollup(events).collect()))
    assert got == want


def test_latency_probe(spark, tmp_path):
    from cassandra_iot_pipeline_spark.catalog import load_table as _lt

    engine = IoTEngine(spark, str(tmp_path / "wh3"))
    engine.ingest_batch(_lt(spark, SF_DIR, "events"))
    probe = engine.latency_probe([12, 13], limit=5).collect()
    assert len(probe) == 2
    assert all(r.latency_ms > 0 and r.n_rows <= 5 for r in probe)


def test_cassandra_sink_options():
    from cassandra_iot_pipeline_spark.streaming.cassandra import (
        CassandraUpsertSink,
    )

    sink = CassandraUpsertSink("sensor_events", consistency_level="ONE")
    opts = sink.writer_options()
    assert opts["keyspace"] == "iot_analytics"
    assert opts["table"] == "sensor_events"
    assert opts["spark.cassandra.output.consistency.level"] == "ONE"
