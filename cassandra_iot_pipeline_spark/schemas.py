"""Typed schema contracts.

Mirrors the reference's centrally-governed Avro data contracts
(reference: iot-cassandra-pipeline/schemas/SensorEvent.avsc:6-39 and
HourlyAggregate.avsc:6-37) as Spark StructTypes, plus the schema of the
driver fixture tables. Keeping these as module-level constants reproduces
the reference's "schema known at plan-construction time" property
(reference: iot-cassandra-pipeline/src/spark_consumer.py:34-57) without a
Schema Registry round trip.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

# --- Reference-native contracts -------------------------------------------

# SensorEvent.avsc: device_id string, device_name string?, timestamp long
# (epoch millis), temperature float, humidity float, location string?.
SENSOR_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("device_id", T.StringType(), False),
        T.StructField("device_name", T.StringType(), True),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("temperature", T.FloatType(), False),
        T.StructField("humidity", T.FloatType(), False),
        T.StructField("location", T.StringType(), True),
    ]
)

# The canonical Avro schema JSON for the pure-Python wire decoder
# (sources/avro.py). Field order matters: Avro binary encodes record
# fields positionally.
SENSOR_EVENT_AVRO = json.dumps(
    {
        "type": "record",
        "name": "SensorEvent",
        "namespace": "com.iot.pipeline",
        "fields": [
            {"name": "device_id", "type": "string"},
            {"name": "device_name", "type": ["null", "string"], "default": None},
            {"name": "timestamp", "type": "long"},
            {"name": "temperature", "type": "float"},
            {"name": "humidity", "type": "float"},
            {"name": "location", "type": ["null", "string"], "default": None},
        ],
    }
)

# HourlyAggregate.avsc: the rollup contract produced by streaming query 2
# (reference: iot-cassandra-pipeline/src/spark_consumer.py:174-192).
HOURLY_AGGREGATE_SCHEMA = T.StructType(
    [
        T.StructField("device_id", T.StringType(), False),
        T.StructField("hour_bucket", T.LongType(), False),
        T.StructField("avg_temperature", T.FloatType(), False),
        T.StructField("max_temperature", T.FloatType(), False),
        T.StructField("min_temperature", T.FloatType(), False),
        T.StructField("event_count", T.IntegerType(), False),
    ]
)

# devices dimension (reference: iot-cassandra-pipeline/cassandra/init.cql:63-74).
DEVICES_SCHEMA = T.StructType(
    [
        T.StructField("device_id", T.StringType(), False),
        T.StructField("device_name", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("last_updated", T.TimestampType(), True),
    ]
)

# --- Driver fixture contracts (FIXTURES.md §B) -----------------------------

EVENTS_FIXTURE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# The JSON payload carried in events.props, for the legacy from_json
# decode path (reference kept a JSON pipeline before Avro:
# iot-cassandra-pipeline/docs/data-contracts.md:28-49).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])
