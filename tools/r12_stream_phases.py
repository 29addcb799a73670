"""One instrumented run of each streaming replay with durationMs
breakdown from StreamingQueryProgress. Usage:
python tools/r12_stream_phases.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def show_progress(q, label):
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        dur = d.get("durationMs") or {}
        state = d.get("stateOperators") or []
        print(
            f"  [{label}] batch={d.get('batchId')} rows={d.get('numInputRows')} "
            f"trigger={dur.get('triggerExecution')}ms addBatch={dur.get('addBatch')}ms "
            f"getBatch={dur.get('getBatch')}ms latestOffset={dur.get('latestOffset')}ms "
            f"queryPlanning={dur.get('queryPlanning')}ms walCommit={dur.get('walCommit')}ms "
            f"commitOffsets={dur.get('commitOffsets')}ms "
            f"stateCommit={sum(s.get('commitTimeMs') or 0 for s in state)}ms",
            flush=True,
        )


def run_hourly(spark, tag):
    from cassandra_iot_pipeline_spark.streaming import pipeline as sp
    from cassandra_iot_pipeline_spark.streaming.sinks import ParquetUpsertSink
    from cassandra_iot_pipeline_spark.streaming.staging import stage_events_stream

    staged = stage_events_stream(spark, SF)
    out_dir = tempfile.mkdtemp(prefix="r12_phase_agg_")
    sink = ParquetUpsertSink(
        os.path.join(out_dir, "hourly_aggregates"), pk=("device_id", "hour_bucket")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        t0 = time.perf_counter()
        q = sp.hourly_agg_query(
            sp.read_event_stream(spark, staged, max_files_per_trigger=32),
            sink,
            os.path.join(out_dir, "ckpt"),
        )
        t1 = time.perf_counter()
        q.awaitTermination()
        t2 = time.perf_counter()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    df = sink.read(spark)
    t3 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t4 = time.perf_counter()
    print(
        f"hourly[{tag}]: start={t1-t0:.3f} await={t2-t1:.3f} "
        f"readctor={t3-t2:.3f} mat={t4-t3:.3f} TOTAL={t4-t0:.3f}",
        flush=True,
    )
    show_progress(q, f"hourly {tag}")


def run_raw(spark, tag):
    from cassandra_iot_pipeline_spark.streaming import pipeline as sp
    from cassandra_iot_pipeline_spark.streaming.dedup import (
        dedup_within_watermark,
        double_delivery,
    )
    from cassandra_iot_pipeline_spark.streaming.sinks import ParquetUpsertSink
    from cassandra_iot_pipeline_spark.streaming.staging import stage_events_stream

    staged = stage_events_stream(spark, SF)
    out_dir = tempfile.mkdtemp(prefix="r12_phase_raw_")
    sink = ParquetUpsertSink(
        os.path.join(out_dir, "sensor_events"), pk=("user_id", "ts", "event_id")
    )
    t0 = time.perf_counter()
    q = sp.raw_passthrough_query(
        dedup_within_watermark(
            double_delivery(spark, staged, max_files_per_trigger=32)
        ),
        sink,
        os.path.join(out_dir, "ckpt"),
    )
    t1 = time.perf_counter()
    q.awaitTermination()
    t2 = time.perf_counter()
    df = sink.read(spark).select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    t3 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t4 = time.perf_counter()
    print(
        f"raw[{tag}]: start={t1-t0:.3f} await={t2-t1:.3f} "
        f"readctor={t3-t2:.3f} mat={t4-t3:.3f} TOTAL={t4-t0:.3f}",
        flush=True,
    )
    show_progress(q, f"raw {tag}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = build_session("r12-stream-phases")
    for r in range(reps):
        run_hourly(spark, f"rep{r}")
    for r in range(reps):
        run_raw(spark, f"rep{r}")
    spark.stop()


if __name__ == "__main__":
    main()
