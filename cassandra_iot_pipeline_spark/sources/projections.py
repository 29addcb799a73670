"""Scalar projection / expression operators (SURVEY.md §2.B, P1-P9).

The reference's projection chain (reference:
iot-cassandra-pipeline/src/spark_consumer.py:115-146):
header strip -> avro decode -> struct flatten -> epoch-millis to
timestamp -> column-pruning select -> casts/aliases.

Everything here is a built-in Catalyst expression — whole-stage
codegen'd, no Python in the row path. The epoch conversion uses exact
integer functions (``timestamp_millis`` / ``unix_micros``) rather than
the reference's lossy string round-trip
``to_timestamp(from_unixtime(ts/1000))`` (reference:
spark_consumer.py:123-126), which truncates sub-second precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def strip_confluent_header(value: Column, validate: bool = True) -> Column:
    """P1: drop the 5-byte Confluent wire header (magic byte + schema id)
    from a binary Kafka value (reference:
    iot-cassandra-pipeline/src/spark_consumer.py:118 — which uses a magic
    100_000 upper bound; length-based slicing is exact).

    ``validate`` (default on) checks the frame is long enough and starts
    with the Confluent magic byte 0x00, failing the task with a
    descriptive error instead of letting a truncated or non-Confluent
    frame decode to garbage downstream. Pure Catalyst (`raise_error`),
    still whole-stage codegen'd."""
    body = value.substr(F.lit(6), F.length(value) - F.lit(5))
    if not validate:
        return body
    return (
        F.when(F.length(value) < 6, _frame_error(value, "frame shorter than 6 bytes"))
        .when(
            value.substr(1, 1) != F.lit(b"\x00"),
            _frame_error(value, "bad Confluent magic byte (expected 0x00)"),
        )
        .otherwise(body)
    )


def _frame_error(value: Column, message: str) -> Column:
    # raise_error returns NULL-typed; cast keeps the branch type binary
    return F.raise_error(
        F.concat(
            F.lit(f"malformed Confluent frame: {message}; frame hex="),
            F.hex(value.substr(1, 16)),
        )
    ).cast("binary")


def epoch_millis_to_timestamp(epoch_ms: Column) -> Column:
    """P4: event-time reconstruction, exact to the millisecond."""
    return F.timestamp_millis(epoch_ms.cast("long"))


def raw_projection(events: DataFrame) -> DataFrame:
    """P4-P8 over the fixtures: reconstruct event time through an
    epoch-millis round trip (proving the conversion is exact), apply the
    contract casts, and prune to the sink columns — the batch form of the
    reference's raw-passthrough projection (reference:
    iot-cassandra-pipeline/src/spark_consumer.py:140-146)."""
    epoch_ms = F.unix_millis(F.col("ts"))
    return events.select(
        F.col("event_id"),
        F.col("user_id").alias("device_id"),
        epoch_ms.alias("ts_ms"),
        # round-trip: millis -> timestamp -> micros; exact integer math
        F.unix_micros(epoch_millis_to_timestamp(epoch_ms)).alias("event_time_us"),
        F.col("value").cast("double").alias("value"),
        F.round(F.col("value") * F.lit(1.8) + F.lit(32.0), 2).alias("value_f"),
    )


def raw_projection_oracle() -> str:
    return """
        SELECT
            event_id,
            user_id AS device_id,
            epoch_ms(ts) AS ts_ms,
            epoch_ms(ts) * 1000 AS event_time_us,
            CAST(value AS DOUBLE) AS value,
            ROUND(value * 1.8 + 32.0, 2) AS value_f
        FROM events
    """
