"""Stream-static enrichment join (streaming/joins.py): batch parity,
no state store, NULL pass-through for dimensionless events."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.streaming.joins import enriched_stream_query
from cassandra_iot_pipeline_spark.streaming.pipeline import read_event_stream
from cassandra_iot_pipeline_spark.streaming.sinks import ParquetUpsertSink
from cassandra_iot_pipeline_spark.streaming.staging import stage_events_stream
from tests.conftest import SF_DIR


def test_stream_static_enrichment_equals_batch_join(spark):
    from cassandra_iot_pipeline_spark.streaming.metrics import ThroughputListener

    staged = stage_events_stream(spark, SF_DIR)
    customers = load_table(spark, SF_DIR, "customer")
    out = tempfile.mkdtemp(prefix="stream_static_")
    sink = ParquetUpsertSink(os.path.join(out, "enriched"), pk=("event_id",))
    listener = ThroughputListener()
    spark.streams.addListener(listener)
    try:
        q = enriched_stream_query(
            read_event_stream(spark, staged, max_files_per_trigger=8),
            customers,
            sink,
            os.path.join(out, "ckpt"),
        )
        q.awaitTermination()
        # the listener bus is asynchronous: the final progress event can
        # arrive after awaitTermination returns — poll until the totals
        # converge on the replay size (bounded, fails loud on timeout)
        import time

        expected = load_table(spark, SF_DIR, "events").count()
        deadline = time.time() + 30
        while time.time() < deadline:
            stats = listener.summary().get(str(q.id))
            if stats and stats["total_rows"] >= expected:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    # every landed row observed without any extra action (the reference
    # re-counts each batch inside foreachBatch to log it); before the
    # sink cached the batch frame across guard+write, this read 2x
    stats = listener.summary().get(str(q.id))
    assert stats is not None
    assert stats["total_rows"] == expected
    assert stats["n_batches"] >= 1 and stats["rows_per_sec"] > 0
    # the join is stateless: no state store operators in the progress
    progress = q.lastProgress
    assert progress is not None and progress["stateOperators"] == []

    got = sink.read(spark).select(
        "event_id", "user_id", "ts_us", "event_type", "value", "segment", "acctbal"
    )
    events = load_table(spark, SF_DIR, "events")
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    )
    want = events.join(dim, "user_id", "left").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_type",
        F.col("value").cast("double").alias("value"),
        "segment",
        "acctbal",
    )
    assert got.count() == events.count()  # left join: nothing dropped
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # fixture users below c_custkey 1 have no dimension row -> NULLs
    nulls = got.filter(F.col("segment").isNull()).count()
    want_nulls = want.filter(F.col("segment").isNull()).count()
    assert nulls == want_nulls
