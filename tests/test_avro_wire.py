"""Avro wire-format codec tests (SURVEY §2.A/2.B P1-P3).

Covers the Confluent 5-byte header strip, the pure-Python Avro binary
codec (round-trip, property-based), and the full Spark decode chain via
mapInPandas."""

from __future__ import annotations

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.schemas import SENSOR_EVENT_SCHEMA
from cassandra_iot_pipeline_spark.sources.avro_wire import (
    decode_sensor_event_body,
    decode_sensor_events,
    encode_sensor_event,
)
from cassandra_iot_pipeline_spark.sources.projections import strip_confluent_header

nullable_text = st.one_of(st.none(), st.text(max_size=40))


@given(
    device_id=st.text(min_size=1, max_size=50),
    device_name=nullable_text,
    timestamp=st.integers(min_value=-(2**62), max_value=2**62),
    temperature=st.floats(width=32, allow_nan=False, allow_infinity=False),
    humidity=st.floats(width=32, allow_nan=False, allow_infinity=False),
    location=nullable_text,
)
@settings(max_examples=200, deadline=None)
def test_codec_round_trip(device_id, device_name, timestamp, temperature, humidity, location):
    frame = encode_sensor_event(
        device_id, device_name, timestamp, temperature, humidity, location
    )
    # header: magic 0x00 + schema id 1
    assert frame[0] == 0
    assert struct.unpack(">I", frame[1:5])[0] == 1
    decoded = decode_sensor_event_body(frame[5:])
    assert decoded[0] == device_id
    assert decoded[1] == device_name
    assert decoded[2] == timestamp
    assert math.isclose(decoded[3], temperature, rel_tol=0, abs_tol=0)
    assert math.isclose(decoded[4], humidity, rel_tol=0, abs_tol=0)
    assert decoded[5] == location


def test_header_strip_expression(spark):
    frame = encode_sensor_event("dev-1", None, 123, 1.5, 2.5, "Rome")
    df = spark.createDataFrame([(frame,)], "value binary")
    body = df.select(strip_confluent_header(F.col("value")).alias("b")).head()["b"]
    assert bytes(body) == frame[5:]


def test_spark_decode_chain(spark):
    rows = [
        ("device-0001", "Sensor-001", 1704067200000, 21.5, 55.25, "Rome"),
        ("device-0002", None, 1704067201000, 34.75, 89.5, None),
        ("device-0003", "Sensor-003", 1704067202000, 15.0, 30.0, "Venice"),
    ]
    frames = spark.createDataFrame(
        [(encode_sensor_event(*r),) for r in rows], "value binary"
    )
    decoded = decode_sensor_events(frames)
    assert decoded.schema == SENSOR_EVENT_SCHEMA
    got = sorted(
        (r.device_id, r.device_name, r.timestamp, round(r.temperature, 2),
         round(r.humidity, 2), r.location)
        for r in decoded.collect()
    )
    assert got == sorted(rows)


def test_bad_magic_byte_fails_with_descriptive_error(spark):
    frame = bytearray(encode_sensor_event("dev-1", None, 123, 1.5, 2.5, "Rome"))
    frame[0] = 0x7F  # not a Confluent frame
    df = spark.createDataFrame([(bytes(frame),)], "value binary")
    import pytest

    with pytest.raises(Exception, match="magic byte"):
        decode_sensor_events(df).collect()


def test_short_frame_fails_with_descriptive_error(spark):
    df = spark.createDataFrame([(b"\x00\x00\x01",)], "value binary")
    import pytest

    with pytest.raises(Exception, match="shorter than 6 bytes"):
        decode_sensor_events(df).collect()


def test_truncated_body_fails_with_descriptive_error(spark):
    frame = encode_sensor_event("device-0001", "Sensor", 123, 1.5, 2.5, "Rome")
    df = spark.createDataFrame([(frame[:-6],)], "value binary")
    import pytest

    with pytest.raises(Exception, match="malformed Avro SensorEvent body"):
        decode_sensor_events(df).collect()


def test_truncated_codec_errors_are_descriptive():
    import pytest

    frame = encode_sensor_event("device-0001", "Sensor", 123, 1.5, 2.5, "Rome")
    body = frame[5:]
    for cut in (0, 1, len(body) // 2, len(body) - 1):
        with pytest.raises(ValueError, match="malformed Avro SensorEvent body"):
            decode_sensor_event_body(body[:cut])


def test_native_from_avro_path_selection(spark, monkeypatch):
    """Auto mode picks the JVM from_avro path exactly when spark-avro is
    on the classpath. This runtime has no jar, so (a) detection is
    False and the Python path runs; (b) forcing availability routes to
    the native builder (stubbed — the jar itself is absent here)."""
    from cassandra_iot_pipeline_spark.sources import avro_wire

    frame = encode_sensor_event("dev-1", None, 123, 1.5, 2.5, "Rome")
    frames = spark.createDataFrame([(frame,)], "value binary")

    assert avro_wire.spark_avro_available(spark) is False
    # auto mode therefore uses the Python codec and decodes fine
    assert decode_sensor_events(frames).count() == 1

    sentinel = {}

    def fake_native(stripped):
        sentinel["called"] = True
        return avro_wire._python_decode(stripped)

    monkeypatch.setattr(avro_wire, "_native_decode", fake_native)
    monkeypatch.setattr(avro_wire, "_SPARK_AVRO_AVAILABLE", True)
    assert decode_sensor_events(frames).count() == 1
    assert sentinel.get("called") is True
