"""User-facing engine facade — the migration target for reference users.

The reference's operational surface is: run the pipeline (producer ->
Kafka -> Spark -> Cassandra), then serve CQL reads against
``sensor_events`` / ``hourly_aggregates`` and watch counts in monitor.sh
(reference: iot-cassandra-pipeline/README.md:113-117,
monitoring/cassandra_latency_check.py:13, monitoring/monitor.sh:79-88).
``IoTEngine`` exposes that exact surface over engine-managed parquet
tables:

    engine = IoTEngine(spark, warehouse_dir)
    engine.ingest_stream(staged_dir)       # the two continuous queries
    engine.ingest_batch(events_df)         # bounded backfill form
    engine.latest_events(device_id, 100)   # the latency-probe read
    engine.hourly_aggregates(device_id)    # the dashboard read
    engine.device_hourly_range(id, a, b)   # clustering-key range read
    engine.table_counts()                  # monitor.sh's SELECT COUNT(*)
    engine.compact()                       # maintenance (compaction)

Every read runs against the PK-reconciled view (Cassandra last-write-
wins semantics); re-ingesting the same data is idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.agg import hourly_rollup
from .streaming.pipeline import run_pipeline
from .streaming.sinks import ParquetUpsertSink

RAW_PK = ("user_id", "ts", "event_id")
AGG_PK = ("device_id", "hour_bucket")


class IoTEngine:
    def __init__(self, spark: SparkSession, warehouse_dir: str) -> None:
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.raw_sink = ParquetUpsertSink(
            os.path.join(warehouse_dir, "sensor_events"),
            pk=RAW_PK,
            sink_options={"consistency_level": "ONE"},
        )
        self.agg_sink = ParquetUpsertSink(
            os.path.join(warehouse_dir, "hourly_aggregates"),
            pk=AGG_PK,
            sink_options={"consistency_level": "QUORUM"},
        )

    # --- ingest ---------------------------------------------------------
    def ingest_stream(
        self, staged_dir: str, max_files_per_trigger: int = 4
    ) -> dict:
        """The reference pipeline: both continuous queries (raw
        passthrough + watermarked hourly rollup) over a replayable
        source, landing in this engine's tables. Returns run_pipeline's
        result (sinks + per-micro-batch ``progress`` timings)."""
        return run_pipeline(
            self.spark,
            staged_dir,
            out_dir=self.warehouse_dir,
            max_files_per_trigger=max_files_per_trigger,
        )

    def ingest_batch(self, events: DataFrame, epoch_id: int = 0) -> None:
        """Bounded backfill: same tables, batch plans (used for
        reprocessing; idempotent by PK upsert)."""
        projected = events.select(
            "event_id", "ts", "user_id", "event_type",
            F.col("value").cast("double").alias("value"),
        )
        self.raw_sink.write_batch(projected, epoch_id)
        self.agg_sink.write_batch(hourly_rollup(events), epoch_id)

    # --- serving reads ---------------------------------------------------
    def sensor_events(self) -> DataFrame:
        return self.raw_sink.read(self.spark)

    def hourly(self) -> DataFrame:
        return self.agg_sink.read(self.spark)

    def latest_events(self, device_id: int, limit: int = 100) -> DataFrame:
        """The latency-probe read: WHERE device_id = ? ORDER BY ts DESC
        LIMIT n (reference: cassandra_latency_check.py:13)."""
        return (
            self.sensor_events()
            .filter(F.col("user_id") == F.lit(device_id))
            .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            .limit(limit)
        )

    def hourly_aggregates(self, device_id: int) -> DataFrame:
        """Dashboard read: all hourly buckets for a device, newest first
        (the hourly_aggregates clustering order, init.cql:48-49)."""
        return (
            self.hourly()
            .filter(F.col("device_id") == F.lit(device_id))
            .orderBy(F.col("hour_bucket").desc())
        )

    def device_hourly_range(
        self, device_id: int, start_bucket: int, end_bucket: int
    ) -> DataFrame:
        """Clustering-key range read on the rollup table."""
        return self.hourly().filter(
            (F.col("device_id") == F.lit(device_id))
            & F.col("hour_bucket").between(start_bucket, end_bucket)
        )

    # --- monitoring ------------------------------------------------------
    def table_counts(self) -> dict[str, int]:
        """monitor.sh's verification counts (reference: monitor.sh:79-88)."""
        counts = {}
        for name, sink in (("sensor_events", self.raw_sink), ("hourly_aggregates", self.agg_sink)):
            counts[name] = sink.read(self.spark).count() if sink.exists() else 0
        return counts

    def table_stats(self) -> DataFrame:
        """Storage-health view: files/bytes/rows per table (the engine's
        answer to the reference's SSTable dashboards)."""
        import glob

        rows = []
        for name, sink in (("sensor_events", self.raw_sink), ("hourly_aggregates", self.agg_sink)):
            files = glob.glob(os.path.join(sink.path, "**", "*.parquet"), recursive=True)
            rows.append(
                (
                    name,
                    len(files),
                    sum(os.path.getsize(f) for f in files),
                    sink.read(self.spark).count() if sink.exists() else 0,
                    sink.sink_options.get("consistency_level", ""),
                )
            )
        return self.spark.createDataFrame(
            rows, "table string, n_files long, n_bytes long, n_rows long, consistency string"
        )

    def latency_probe(self, device_ids: list[int], limit: int = 100) -> DataFrame:
        """The reference's read-latency probe (reference:
        monitoring/cassandra_latency_check.py:5-21): time the
        point-lookup read per device, return (device_id, n_rows,
        latency_ms). Driver-side timing of an action, like the original
        perf_counter loop."""
        import time

        rows = []
        for device_id in device_ids:
            t0 = time.perf_counter()
            n = len(self.latest_events(device_id, limit).collect())
            rows.append((device_id, n, (time.perf_counter() - t0) * 1000.0))
        return self.spark.createDataFrame(
            rows, "device_id long, n_rows long, latency_ms double"
        )

    # --- maintenance -----------------------------------------------------
    def compact(self) -> None:
        for sink in (self.raw_sink, self.agg_sink):
            if sink.exists():
                sink.compact(self.spark)
