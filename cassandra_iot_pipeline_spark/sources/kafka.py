"""Kafka source/sink builders — the production ingest path (SURVEY §2.A
S1/S4).

The reference consumes ``sensor-events`` with earliest offsets and
data-loss tolerance (reference:
iot-cassandra-pipeline/src/spark_consumer.py:89-95) and produces
Confluent-framed Avro with acks=1/snappy batching (producer.py:91-97).
These builders construct the same plans on a cluster with the
spark-sql-kafka connector on the classpath; this test runtime has no
Kafka jar or broker, so they are exercised structurally (options dict)
and the decode chain itself is verified through the file-replay path
(streaming/pipeline.py) — the lineage after the source is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SOURCE_DEFAULTS = {
    # reference: spark_consumer.py:93-94 (W8 tolerance knobs)
    "startingOffsets": "earliest",
    "failOnDataLoss": "false",
}


def kafka_source_options(
    bootstrap_servers: str, topic: str, **overrides: str
) -> dict[str, str]:
    opts = dict(SOURCE_DEFAULTS)
    opts.update(
        {
            "kafka.bootstrap.servers": bootstrap_servers,
            "subscribe": topic,
        }
    )
    opts.update(overrides)
    return opts


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, **overrides: str
) -> DataFrame:
    """readStream.format('kafka') with the reference's options. The
    result feeds sources/avro_wire.decode_sensor_events — the same
    decode chain the file-replay tests verify."""
    reader = spark.readStream.format("kafka")
    for key, value in kafka_source_options(
        bootstrap_servers, topic, **overrides
    ).items():
        reader = reader.option(key, value)
    return reader.load()


def write_kafka_stream(
    frames: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """writeStream to Kafka: expects a binary ``value`` column (the
    Confluent-framed payload from avro_wire.encode_events_as_frames)."""
    return (
        frames.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
