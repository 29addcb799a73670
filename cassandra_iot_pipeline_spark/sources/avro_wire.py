"""Confluent-framed Avro wire format codec (SURVEY.md §2.A S2/S4, §2.B P1-P3).

The reference's events travel as Confluent-framed Avro: a 5-byte header
(magic byte 0x00 + big-endian 4-byte schema id) followed by the Avro
binary body (reference: iot-cassandra-pipeline/src/producer.py:74-82;
spark_consumer.py:104-120; docs/data-contracts.md:122-126).

``decode_sensor_events`` picks the decode engine at plan time:
when the spark-avro package is on the JVM classpath (checked once via
``spark_avro_available``), it uses native ``from_avro`` — the
production ingest path (reference: spark_consumer.py:117-120), fully
codegen'd, no Python workers. This runtime image carries no spark-avro
jar, so the tested fallback is a self-contained pure-Python Avro
*binary* codec for the SensorEvent record (zigzag varints,
length-prefixed UTF-8 strings, little-endian floats, union index bytes
— the Avro 1.x binary encoding spec) applied via ``mapInPandas``:
Arrow-batched, one Python call per record *batch*, never per row via
Py4J. Every read is bounds-checked and the Confluent magic byte is
validated at the header strip.

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

from ..schemas import SENSOR_EVENT_AVRO, SENSOR_EVENT_SCHEMA
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
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint (buffer exhausted)")
        if shift > 63:
            raise ValueError("varint longer than 64 bits")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag_encode(len(raw)) + raw


def _read_exact(buf: io.BytesIO, n: int, what: str) -> bytes:
    raw = buf.read(n)
    if len(raw) < n:
        raise EOFError(f"truncated {what}: wanted {n} bytes, got {len(raw)}")
    return raw


def _read_string(buf: io.BytesIO) -> str:
    n = _zigzag_decode(buf)
    if n < 0:
        raise ValueError(f"negative string length {n}")
    return _read_exact(buf, n, "string").decode("utf-8")


def _write_nullable_string(s: str | None) -> bytes:
    if s is None:
        return _zigzag_encode(0)  # union branch 0 = null
    return _zigzag_encode(1) + _write_string(s)


def _read_nullable_string(buf: io.BytesIO) -> str | None:
    branch = _zigzag_decode(buf)
    if branch not in (0, 1):
        raise ValueError(f"invalid union branch index {branch}")
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
    SENSOR_EVENT_SCHEMA field order. Every read is bounds-checked: a
    truncated or corrupt body raises a descriptive ValueError (not an
    opaque IndexError from deep inside the codec)."""
    buf = io.BytesIO(payload)
    try:
        device_id = _read_string(buf)
        device_name = _read_nullable_string(buf)
        timestamp = _zigzag_decode(buf)
        temperature = struct.unpack("<f", _read_exact(buf, 4, "float"))[0]
        humidity = struct.unpack("<f", _read_exact(buf, 4, "float"))[0]
        location = _read_nullable_string(buf)
    except (EOFError, ValueError, UnicodeDecodeError) as exc:
        raise ValueError(
            f"malformed Avro SensorEvent body at offset {buf.tell()} "
            f"(len {len(payload)}): {exc}"
        ) from exc
    return (device_id, device_name, timestamp, temperature, humidity, location)


_SPARK_AVRO_AVAILABLE: bool | None = None


def spark_avro_available(spark) -> bool:
    """True when the spark-avro module (the external
    ``org.apache.spark:spark-avro`` package the reference loads at
    ``spark_consumer.py:66-68``) is on the JVM classpath. Checked once
    per process by analyzing a tiny ``from_avro`` plan — the Python
    wrapper always imports; only plan analysis touches the JVM class."""
    global _SPARK_AVRO_AVAILABLE
    if _SPARK_AVRO_AVAILABLE is None:
        try:
            from pyspark.sql.avro.functions import from_avro

            probe = spark.range(1).select(
                from_avro(
                    F.lit(None).cast("binary"), SENSOR_EVENT_AVRO
                ).alias("r")
            )
            probe.schema  # forces analysis -> resolves the Avro classes
            _SPARK_AVRO_AVAILABLE = True
        except Exception:
            _SPARK_AVRO_AVAILABLE = False
    return _SPARK_AVRO_AVAILABLE


def _native_decode(stripped: DataFrame) -> DataFrame:
    """JVM ``from_avro`` decode (reference: spark_consumer.py:117-120) —
    the production path: whole-stage codegen'd, no Python workers on the
    ingest hot path. FAILFAST surfaces malformed bodies like the Python
    codec's bounds checks do."""
    from pyspark.sql.avro.functions import from_avro

    return stripped.select(
        from_avro(
            F.col("body"), SENSOR_EVENT_AVRO, {"mode": "FAILFAST"}
        ).alias("data")
    ).select("data.*")


def _python_decode(stripped: DataFrame) -> DataFrame:
    """Pure-Python Arrow-batched codec — the in-sandbox fallback (no
    spark-avro jar in this runtime)."""
    cols = [f.name for f in SENSOR_EVENT_SCHEMA.fields]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_sensor_event_body(b) for b in pdf["body"]]
            yield pd.DataFrame(rows, columns=cols)

    return stripped.mapInPandas(decode_batches, schema=SENSOR_EVENT_SCHEMA)


def decode_sensor_events(
    frames: DataFrame, value_col: str = "value", use_native: bool | None = None
) -> DataFrame:
    """P1+P2+P3: strip the Confluent header (validated — bad magic or a
    short frame raises, not garbage), decode Avro, flatten to top-level
    columns — the reference's full decode chain
    (reference: iot-cassandra-pipeline/src/spark_consumer.py:115-122).

    ``use_native=None`` auto-detects: JVM ``from_avro`` when the
    spark-avro package is present (the 100 TB ingest path — per-record
    Python decode would bottleneck there), else the Arrow-batched
    pure-Python codec. Both paths produce SENSOR_EVENT_SCHEMA.

    Input: a DataFrame with a binary ``value_col`` (Kafka-style frames).
    """
    stripped = frames.select(
        strip_confluent_header(F.col(value_col)).alias("body")
    )
    if use_native is None:
        use_native = spark_avro_available(frames.sparkSession)
    return _native_decode(stripped) if use_native else _python_decode(stripped)


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
    value hash.

    The scan fans out BELOW full core width (r12, parallel.fan_out_scan
    at a quarter of the session's parallelism): the encode->decode
    Python chain inherits the scan's partitioning (mapInPandas preserves
    it — a property the streaming staging test relies on, so the
    fan-out lives HERE, not inside the encoder), and on the single-split
    fixture files the whole codec ran in ONE Python worker (~0.8 s of
    the query, measured at sf0.1). But the chain holds TWO Arrow
    workers per task (encoder and decoder pipelined inside one stage),
    so a full 32-way fan-out meant 64 concurrent Python workers — the
    Python-facing fan-out failure mode this round's embedding_near_dups
    negative result documented: interleaved A/B at sf0.1 measured
    width 32 at median 1.86 s with 3.6-8.8 s spin-up-storm modes (the
    in-bench 8-9 s regression this fixes), while widths 6-12 sit at
    median 0.89 s — the codec CPU is spread, and the worker count stays
    at or below the core count. Width = defaultParallelism/4 (8 on the
    bench host); keyed by event_id so placement is deterministic;
    results are placement-independent (per-row codec, exact-integer
    rollup); no-op on wide inputs (the at-scale case)."""
    from ..parallel import fan_out_scan

    width = max(2, events.sparkSession.sparkContext.defaultParallelism // 4)
    decoded = decode_sensor_events(
        encode_events_as_frames(fan_out_scan(events, "event_id", target=width))
    )
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
