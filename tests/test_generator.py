"""Generator determinism (SURVEY §2.A S3): hash-derived draws must be
identical regardless of partition layout — the reproducibility property
a distributed backfill needs (rand(seed) does NOT have it)."""

from __future__ import annotations

from cassandra_iot_pipeline_spark.sources.generator import (
    devices_dimension,
    sensor_events,
)


def test_deterministic_across_partitioning(spark):
    a = sensor_events(spark, n_devices=10, n_seconds=20).repartition(1)
    b = sensor_events(spark, n_devices=10, n_seconds=20).repartition(7)
    key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    rows_a = sorted(map(tuple, a.collect()), key=key)
    rows_b = sorted(map(tuple, b.collect()), key=key)
    assert rows_a == rows_b
    assert len(rows_a) == 200


def test_value_domains(spark):
    df = sensor_events(spark, n_devices=20, n_seconds=50, with_nulls=False)
    pdf = df.toPandas()
    assert pdf["temperature"].between(15.0, 35.0).all()
    assert pdf["humidity"].between(30.0, 90.0).all()
    assert pdf["device_id"].nunique() == 20
    assert set(pdf["location"].unique()) <= {
        "Rome", "Milan", "Naples", "Turin", "Florence", "Venice", "Bologna"
    }


def test_devices_dimension_keys(spark):
    dim = devices_dimension(spark, n_devices=30)
    assert dim.count() == 30
    assert dim.select("device_id").distinct().count() == 30
