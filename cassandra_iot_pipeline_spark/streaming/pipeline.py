"""The reference's two continuous queries, Spark-first (SURVEY §2.J).

Query 1 — raw passthrough: stream -> projection -> upsert sink
(reference: iot-cassandra-pipeline/src/spark_consumer.py:131-160).
Query 2 — watermarked hourly aggregation: stream -> withWatermark(1 min)
-> window(1 hour) -> avg/max/min/count -> upsert sink
(reference: spark_consumer.py:164-211).

Differences from the reference, by design:
- **update mode + PK-upsert sink** instead of append mode. The reference
  relies on Cassandra's last-write-wins PK upsert to make re-emitted
  rows idempotent (init.cql:25,48); with an upsert sink, update mode
  gives the same end state *and* serves partial aggregates for the
  current hour instead of holding them until the watermark closes the
  window. Append mode (the reference's literal choice) is one flag away.
- **exact aggregation state**: the windowed sum is kept in integer units
  (see operators/exactmath.py), so streaming and batch rollups agree
  bit-for-bit — re-running a checkpoint never drifts the aggregates.
- **isEmpty guard** instead of the reference's double count()
  (spark_consumer.py:139+154 — two extra full scans per micro-batch).

Both queries share one source lineage and run concurrently under the
same SparkSession (W7, awaitAnyTermination), each with its own
checkpoint (W5).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import EVENTS_FIXTURE_SCHEMA
from .sinks import ParquetUpsertSink

WATERMARK_DELAY = "1 minute"  # reference: spark_consumer.py:171-172
WINDOW = "1 hour"  # reference: spark_consumer.py:177


def read_event_stream(
    spark: SparkSession, staged_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """W8/S1: bounded file-source stand-in for the Kafka source. The
    parquet schema is declared up front (streaming sources require it —
    same property as the reference's plan-time schema fetch,
    spark_consumer.py:34-57)."""
    schema = EVENTS_FIXTURE_SCHEMA
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staged_dir)
    )


#: default trigger for bounded fixture replays. Production wall-clock
#: cadence (the reference's 5-second micro-batches,
#: spark_consumer.py:210) is ``{"processingTime": "5 seconds"}`` —
#: exercised end-to-end by tests/test_streaming.py (W6).
DEFAULT_TRIGGER: dict = {"availableNow": True}

#: files per micro-batch for the bounded bench replays. One knob for all
#: four driver-facing replay queries. The current sf0.1 fixture stages as
#: ~30 day files, so 32 already replays as ONE availableNow batch —
#: measured (r3): larger values change nothing, and the residual
#: streaming bench cost is fixed machinery (checkpoint init, state-store
#: open/commit, sink write, query start/stop) plus host noise, not batch
#: cadence. Multi-batch state-semantics coverage lives in
#: tests/test_streaming.py with its own small trigger sizes.
REPLAY_FILES_PER_TRIGGER = 32


from contextlib import contextmanager  # noqa: E402


@contextmanager
def bounded_replay_confs(
    spark: SparkSession,
    state_partitions: int = 8,
    skip_no_data_batch: bool = False,
):
    """Session confs for the bounded driver-facing replays, restored on
    exit.

    ``state_partitions`` sizes the stateful shuffle (state-store commits
    are per partition per batch — the dominant cost at fixture scale).

    ``skip_no_data_batch`` disables the trailing empty micro-batch
    (``spark.sql.streaming.noDataMicroBatches.enabled=false``) — ONLY
    valid for queries whose final no-data batch provably emits nothing:
    update-mode aggregation (all groups already emitted in their data
    batch; watermark advance only evicts state), arrival-time
    ``dropDuplicatesWithinWatermark`` (rows emit on first arrival), and
    INNER stream-stream joins (pairs emit when matched; only outer
    joins emit at eviction). NOT for operators that emit on watermark
    advance (e.g. the sessionizer closes sessions in that batch, and
    append-mode windowed aggregation finalizes there). Measured at
    sf0.1 (interleaved A/B, min-of-3): hourly rollup 2.88 → 2.28 s,
    raw passthrough 3.66 → 2.90 s, conversion pairs medians 5.6 → 3.7 s
    — the no-data batch costs a full trigger execution (state-store
    load + commit per partition) and buys these queries nothing. Row
    sets verified identical here and bitwise via the oracle gate."""
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if skip_no_data_batch:
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "false"
        )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )


def raw_passthrough_query(
    stream: DataFrame,
    sink: ParquetUpsertSink,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Query 1: decode/project and land every event, PK (user_id, ts,
    event_id) — the sensor_events table write
    (reference: spark_consumer.py:137-160)."""
    projected = stream.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
    )
    return (
        projected.writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or DEFAULT_TRIGGER))
        .start()
    )


def hourly_agg_query(
    stream: DataFrame,
    sink: ParquetUpsertSink,
    checkpoint_dir: str,
    output_mode: str = "update",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Query 2: watermarked tumbling-window aggregation
    (reference: spark_consumer.py:171-192).

    State: integer-units sum + count + min/max per (device, window) —
    bounded by the watermark (W1). Output rows match the batch
    hourly_rollup contract exactly.
    """
    agg = (
        stream.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(
            F.col("user_id").alias("device_id"),
            F.window("ts", WINDOW).alias("hour_window"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_units"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .select(
            "device_id",
            F.unix_timestamp(F.col("hour_window.start"))
            .cast("long")
            .alias("hour_bucket"),
            (F.col("sum_units") / F.lit(100.0) / F.col("event_count")).alias(
                "avg_value"
            ),
            "max_value",
            "min_value",
            "event_count",
        )
    )
    return (
        agg.writeStream.foreachBatch(sink.foreach_batch())
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or DEFAULT_TRIGGER))
        .start()
    )


def run_pipeline(
    spark: SparkSession,
    staged_dir: str,
    out_dir: str | None = None,
    max_files_per_trigger: int = 1,
    state_partitions: int | None = 8,
) -> dict[str, ParquetUpsertSink]:
    """W7: both continuous queries concurrently off one source lineage,
    blocking until the bounded replay completes (availableNow). Returns
    the two sinks (raw + agg) for reading.

    ``state_partitions`` sizes the stateful shuffle for the bounded
    replay (state-store commits are per partition per batch — the
    dominant cost at fixture scale); pass None to keep the session
    setting (e.g. on a real cluster)."""
    out_dir = out_dir or tempfile.mkdtemp(prefix="spark_graft_pipeline_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # Query 1 is stateless (no watermark — never gets a no-data batch);
    # query 2 is the update-mode aggregation, whose trailing no-data
    # batch only evicts state (every group already emitted in its data
    # batch) — skip it, same as streaming_hourly_rollup below.
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    raw_sink = ParquetUpsertSink(
        os.path.join(out_dir, "sensor_events"),
        pk=("user_id", "ts", "event_id"),
        sink_options={"consistency_level": "ONE"},  # reference: spark_consumer.py:152
    )
    agg_sink = ParquetUpsertSink(
        os.path.join(out_dir, "hourly_aggregates"),
        pk=("device_id", "hour_bucket"),
        sink_options={"consistency_level": "QUORUM"},  # reference: spark_consumer.py:202
    )
    q1 = raw_passthrough_query(
        read_event_stream(spark, staged_dir, max_files_per_trigger),
        raw_sink,
        os.path.join(out_dir, "ckpt_raw"),
    )
    # output_mode pinned HERE, next to the no-data-batch conf above: the
    # skip is only safe because update mode emits every group in its
    # data batch (append mode finalizes on watermark advance and would
    # silently drop final rows — ADVICE r12). Keep the two coupled.
    q2 = hourly_agg_query(
        read_event_stream(spark, staged_dir, max_files_per_trigger),
        agg_sink,
        os.path.join(out_dir, "ckpt_agg"),
        output_mode="update",
    )
    try:
        q1.awaitTermination()
        q2.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
    return {
        "raw": raw_sink,
        "agg": agg_sink,
        "progress": {
            "raw": query_progress(q1),
            "agg": query_progress(q2),
        },
    }


def query_progress(q) -> list[dict]:
    """Compact per-micro-batch timing rows from a (finished) streaming
    query's ``recentProgress`` — the attribution surface the bench
    records so a round-over-round pipeline delta decomposes into which
    batches (and which phase: planning, addBatch, state commit) moved,
    instead of one opaque events/s number (r5 verdict item #1).
    Driver-side metadata only (Spark keeps the last 100 progress
    events in memory); no executor work."""
    import json as _json

    rows = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else _json.loads(p.json)
        dur = d.get("durationMs") or {}
        state = d.get("stateOperators") or []
        rows.append(
            {
                "batch_id": d.get("batchId"),
                "input_rows": d.get("numInputRows"),
                "trigger_ms": dur.get("triggerExecution"),
                "add_batch_ms": dur.get("addBatch"),
                "state_commit_ms": sum(
                    s.get("commitTimeMs") or 0 for s in state
                ),
                "state_rows": sum(s.get("numRowsTotal") or 0 for s in state),
            }
        )
    return rows


def sliding_agg_query(
    stream: DataFrame,
    sink: ParquetUpsertSink,
    checkpoint_dir: str,
    window: str = "1 hour",
    slide: str = "15 minutes",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Hopping-window streaming aggregation — the overlapping-window
    companion to :func:`hourly_agg_query`, matching the batch
    ``operators/agg.py::sliding_rollup`` contract exactly (same
    integer-units arithmetic, same origin-aligned window assignment).
    State holds w/s windows per device instead of one; the watermark
    bounds it identically (a window's state is evictable once the
    watermark passes its end)."""
    agg = (
        stream.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(
            F.col("user_id").alias("device_id"),
            F.window("ts", window, slide).alias("w"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_units"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .select(
            "device_id",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("bucket_start"),
            (F.col("sum_units") / F.lit(100.0) / F.col("event_count")).alias(
                "avg_value"
            ),
            "max_value",
            "min_value",
            "event_count",
        )
    )
    return (
        agg.writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or DEFAULT_TRIGGER))
        .start()
    )


def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing entry: replay the events fixture as micro-batches,
    run the watermarked streaming rollup through the upsert sink, and
    return the reconciled result — which must equal the *batch*
    hourly_rollup (same oracle), proving streaming/batch semantic parity.

    Stateful-query cost is dominated by state-store commits: one per
    state partition per micro-batch. For this bounded fixture replay the
    state partition count is dropped to 8 for the query's lifetime (the
    checkpoint pins it at first start), and batches carry
    REPLAY_FILES_PER_TRIGGER day-files (a single availableNow batch on
    the current ~30-file sf0.1 staging; 8->16 files/trigger measured
    2.6x on the stream-stream join at sf0.1, 16->32 another 1.6x —
    results identical at any granularity, and multi-batch state
    semantics are exercised in tests/test_streaming.py). Batches stay
    time-ordered and day-disjoint.
    """
    from .staging import stage_events_stream

    staged = stage_events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="spark_graft_stream_agg_")
    sink = ParquetUpsertSink(
        os.path.join(out_dir, "hourly_aggregates"), pk=("device_id", "hour_bucket")
    )
    # update mode: every group is emitted in its data batch, so the
    # trailing no-data batch (state eviction only) is skipped — see
    # bounded_replay_confs for the measurement and the safety argument.
    with bounded_replay_confs(spark, skip_no_data_batch=True):
        q = hourly_agg_query(
            read_event_stream(spark, staged, max_files_per_trigger=REPLAY_FILES_PER_TRIGGER),
            sink,
            os.path.join(out_dir, "ckpt"),
        )
        q.awaitTermination()
    # update-mode aggregation emits each group at most once per batch,
    # so the single-epoch replay read can skip the reconcile window
    # (multi-epoch replays keep it — sinks.read falls back by itself).
    return sink.read(spark, unique_within_epoch=True)


def streaming_raw_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing entry: raw passthrough under the at-least-once
    worst case — every record is delivered TWICE (two file sources over
    the same staging) and ``dropDuplicatesWithinWatermark`` drops the
    re-deliveries in-stream before the sink (streaming/dedup.py), so
    the result still equals a batch projection of the source. The
    sink's PK upsert stays on as the second layer, mirroring the
    reference's Kafka at-least-once + Cassandra LWW pair; the in-stream
    layer is what keeps duplicate volume out of the sink shuffle at
    scale. tests/test_streaming.py asserts the sink *log* (not just the
    reconciled view) carries each event once."""
    from .dedup import dedup_within_watermark, double_delivery
    from .staging import stage_events_stream

    staged = stage_events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="spark_graft_stream_raw_")
    sink = ParquetUpsertSink(
        os.path.join(out_dir, "sensor_events"), pk=("user_id", "ts", "event_id")
    )
    # arrival-time dedup: rows emit on first arrival, so the trailing
    # no-data batch (state eviction only) is skipped — see
    # bounded_replay_confs. State partitions pinned at 8 like the other
    # bounded replays (this entry alone had been running its dedup
    # state at the session's 32 — 32 RocksDB opens+commits per batch;
    # interleaved A/B at sf0.1: w8 min 2.84 / med 3.57 vs w32 min 5.14
    # / med 10.08).
    with bounded_replay_confs(spark, skip_no_data_batch=True):
        q = raw_passthrough_query(
            dedup_within_watermark(
                double_delivery(
                    spark, staged, max_files_per_trigger=REPLAY_FILES_PER_TRIGGER
                )
            ),
            sink,
            os.path.join(out_dir, "ckpt"),
        )
        q.awaitTermination()
    # the in-stream arrival-time dedup guarantees each PK appears once
    # in the whole replay (a fortiori once per epoch): single-epoch
    # reads skip the reconcile window.
    return sink.read(spark, unique_within_epoch=True).select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


def streaming_sessionize_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing entry for the custom stateful operator
    (streaming/stateful.py): bounded replay, emits closed sessions.
    Oracle: the batch sessionization minus each user's open last
    session."""
    import uuid

    from .stateful import streaming_sessionize
    from .staging import stage_events_stream

    staged = stage_events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="spark_graft_stream_sess_")
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            streaming_sessionize(
                read_event_stream(spark, staged, max_files_per_trigger=REPLAY_FILES_PER_TRIGGER)
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)
