"""Custom stateful operator (applyInPandasWithState): streaming
sessionization must agree with the batch formulation for closed
sessions, with state carried across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.windows import session_stats
from cassandra_iot_pipeline_spark.streaming.pipeline import read_event_stream
from cassandra_iot_pipeline_spark.streaming.staging import stage_events_stream
from cassandra_iot_pipeline_spark.streaming.stateful import streaming_sessionize
from tests.conftest import SF_DIR


def test_streaming_sessions_match_batch(spark, tmp_path):
    staged = stage_events_stream(spark, SF_DIR, base_dir=str(tmp_path / "st"))
    stream = read_event_stream(spark, staged, max_files_per_trigger=8)
    q = (
        streaming_sessionize(stream, gap_s=1800)
        .writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.start_us, r.end_us, r.n_events, r.session_value)
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }

    events = load_table(spark, SF_DIR, "events")
    batch = session_stats(events, gap_s=1800)
    # the open (last) session per user is still in state — exclude it
    last_session = batch.groupBy("user_id").agg(
        F.max("session_id").alias("last_sid")
    )
    closed_batch = batch.join(
        last_session,
        (batch.user_id == last_session.user_id)
        & (batch.session_id == last_session.last_sid),
        "left_anti",
    )
    want = {
        (r.user_id, r.start_us, r.end_us, r.n_events, r.session_value)
        for r in closed_batch.collect()
    }
    assert got == want
    assert len(got) > 0


def test_sessions_correct_when_groups_straddle_arrow_chunks(spark, tmp_path):
    """Regression: a group's rows within one micro-batch arrive as
    multiple Arrow chunks in arbitrary order. With 7-row chunks every
    group straddles boundaries; the operator must concat-then-sort, not
    sort per chunk (which produced sessions with end < start)."""
    staged = stage_events_stream(spark, SF_DIR, base_dir=str(tmp_path / "st"))
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = read_event_stream(spark, staged, max_files_per_trigger=32)
        q = (
            streaming_sessionize(stream, gap_s=1800)
            .writeStream.format("memory")
            .queryName("chunked_sessions")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt7"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    rows = spark.sql("SELECT * FROM chunked_sessions").collect()
    assert rows, "no sessions emitted"
    assert all(r.start_us <= r.end_us for r in rows)

    events = load_table(spark, SF_DIR, "events")
    batch = session_stats(events, gap_s=1800)
    last_session = batch.groupBy("user_id").agg(
        F.max("session_id").alias("last_sid")
    )
    n_closed_batch = batch.join(
        last_session,
        (batch.user_id == last_session.user_id)
        & (batch.session_id == last_session.last_sid),
        "left_anti",
    ).count()
    assert len(rows) == n_closed_batch
