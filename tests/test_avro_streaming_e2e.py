"""The literal reference pipeline, wire format included: Confluent-framed
Avro event bytes -> streaming decode (header strip + binary Avro) ->
watermarked hourly aggregation -> upsert sink. The reference does exactly
this from Kafka (spark_consumer.py:89-211); here the framed bytes replay
from files and the result must equal the batch rollup over the decoded
events."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.sources.avro_wire import (
    decode_sensor_events,
    encode_events_as_frames,
)
from cassandra_iot_pipeline_spark.streaming.sinks import ParquetUpsertSink
from tests.conftest import SF_DIR


def test_streaming_avro_decode_rollup(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")

    # stage framed Avro bytes as replay files: range-partition by event
    # time BEFORE encoding so chunk k's part file holds an ascending time
    # range (mapInPandas preserves partitioning) — batches replay in
    # event-time order and the 1-minute watermark never drops fixture rows
    src = str(tmp_path / "frames")
    os.makedirs(src)
    frames = encode_events_as_frames(events.repartitionByRange(4, "ts"))
    staged = str(tmp_path / "staged")
    frames.write.parquet(staged)
    now = time.time()
    for i, part in enumerate(sorted(glob.glob(os.path.join(staged, "part-*.parquet")))):
        dst = os.path.join(src, f"chunk_{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (now - 40 + i, now - 40 + i))

    stream = (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    decoded = decode_sensor_events(stream)
    agg = (
        decoded.withColumn("event_time", F.timestamp_millis(F.col("timestamp")))
        .withWatermark("event_time", "1 minute")
        .groupBy(
            F.col("device_id"),
            F.window("event_time", "1 hour").alias("w"),
        )
        .agg(
            F.sum(
                F.round(F.col("temperature").cast("double") * 100).cast("long")
            ).alias("sum_units"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .select(
            "device_id",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("hour_bucket"),
            (F.col("sum_units") / F.lit(100.0) / F.col("event_count")).alias(
                "avg_value"
            ),
            "event_count",
        )
    )
    sink = ParquetUpsertSink(
        str(tmp_path / "out"), pk=("device_id", "hour_bucket")
    )
    q = (
        agg.writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(map(tuple, sink.read(spark).select(
        "device_id", "hour_bucket", "avg_value", "event_count").collect()))

    # batch truth over the decoded (float32-narrowed) events
    want = sorted(map(tuple, (
        decode_sensor_events(encode_events_as_frames(events))
        .withColumn("event_time", F.timestamp_millis(F.col("timestamp")))
        .groupBy(
            "device_id",
            F.unix_timestamp(F.date_trunc("hour", F.col("event_time")))
            .cast("long")
            .alias("hour_bucket"),
        )
        .agg(
            F.sum(
                F.round(F.col("temperature").cast("double") * 100).cast("long")
            ).alias("su"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .select(
            "device_id",
            "hour_bucket",
            (F.col("su") / F.lit(100.0) / F.col("event_count")).alias("avg_value"),
            "event_count",
        )
    ).collect()))
    assert got == want
    assert len(got) > 0
