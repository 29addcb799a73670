"""Deterministic distributed sensor-event generator (SURVEY.md §2.A S3).

The reference's producer simulates 100 devices emitting one reading per
second — seeded Faker, uniform temperature 15-35 / humidity 30-90, seven
city labels (reference: iot-cassandra-pipeline/src/producer.py:116-129,
153-176). That generator is a single-process Python loop; this one is a
Spark plan over ``spark.range`` so it scales to any row count with no
driver bottleneck and no Python in the row path.

Determinism without ``rand()``: ``rand(seed)`` is partition-layout
dependent, so instead every pseudo-random draw is a pure hash of the row
id (xxhash64), which is reproducible across partition counts, executors,
and cluster sizes — the property a 100 TB backfill needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CITIES = ("Rome", "Milan", "Naples", "Turin", "Florence", "Venice", "Bologna")
BASE_EPOCH_MS = 1704067200000  # 2024-01-01T00:00:00Z


def _unit_hash(seed_col, salt: str):
    """Uniform [0,1) double derived from a 64-bit hash of (salt, id)."""
    h = F.xxhash64(F.lit(salt), seed_col)
    return (F.pmod(h, F.lit(1_000_000)).cast("double")) / F.lit(1_000_000.0)


def sensor_events(
    spark: SparkSession,
    n_devices: int = 100,
    n_seconds: int = 200,
    with_nulls: bool = True,
) -> DataFrame:
    """Generate ``n_devices * n_seconds`` SensorEvent rows, one reading
    per device per second, matching the reference's value domains."""
    df = spark.range(n_devices * n_seconds)
    device_idx = (F.col("id") % n_devices).cast("long")
    second = (F.col("id") / n_devices).cast("long")
    temp = F.round(F.lit(15.0) + _unit_hash(F.col("id"), "temp") * 20.0, 2)
    hum = F.round(F.lit(30.0) + _unit_hash(F.col("id"), "hum") * 60.0, 2)
    city = F.element_at(
        F.array(*[F.lit(c) for c in CITIES]),
        (F.pmod(F.xxhash64(F.lit("city"), device_idx), F.lit(len(CITIES))) + 1).cast("int"),
    )
    name = F.format_string("Sensor-%03d", device_idx.cast("int"))
    df = df.select(
        F.format_string("device-%04d", device_idx.cast("int")).alias("device_id"),
        name.alias("device_name"),
        (F.lit(BASE_EPOCH_MS) + second * 1000).alias("timestamp"),
        temp.cast("float").alias("temperature"),
        hum.cast("float").alias("humidity"),
        city.alias("location"),
    )
    if with_nulls:
        # ~5% null device_name/location, like the Avro nullable unions.
        df = df.select(
            "device_id",
            F.when(_unit_hash(F.col("timestamp"), "nn") < 0.05, F.lit(None))
            .otherwise(F.col("device_name"))
            .alias("device_name"),
            "timestamp",
            "temperature",
            "humidity",
            F.when(_unit_hash(F.col("timestamp"), "nl") < 0.05, F.lit(None))
            .otherwise(F.col("location"))
            .alias("location"),
        )
    return df


def devices_dimension(spark: SparkSession, n_devices: int = 100) -> DataFrame:
    """The ``devices`` dimension the reference declares but never joins
    (reference: iot-cassandra-pipeline/cassandra/init.cql:63-74) —
    generated to pair with J1 enrichment joins."""
    df = spark.range(n_devices)
    idx = F.col("id").cast("long")
    city = F.element_at(
        F.array(*[F.lit(c) for c in CITIES]),
        (F.pmod(F.xxhash64(F.lit("city"), idx), F.lit(len(CITIES))) + 1).cast("int"),
    )
    return df.select(
        F.format_string("device-%04d", idx.cast("int")).alias("device_id"),
        F.format_string("Sensor-%03d", idx.cast("int")).alias("device_name"),
        city.alias("location"),
        F.timestamp_millis(F.lit(BASE_EPOCH_MS)).alias("created_at"),
        F.timestamp_millis(F.lit(BASE_EPOCH_MS)).alias("last_updated"),
    )
