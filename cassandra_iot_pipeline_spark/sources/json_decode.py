"""Legacy JSON decode path (SURVEY.md §2.I).

Before adopting Avro data contracts the reference parsed JSON with
``from_json`` against a hard-coded StructType (reference:
iot-cassandra-pipeline/docs/data-contracts.md:28-49). The engine keeps
that path alive: the fixture ``events.props`` column carries a JSON
string, decoded here with native Catalyst JSON expressions (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EVENT_PROPS_SCHEMA


def decode_props(events: DataFrame) -> DataFrame:
    """from_json over the props payload; extracts the ``k`` field."""
    return events.select(
        "event_id",
        F.from_json(F.col("props"), EVENT_PROPS_SCHEMA).getField("k").alias("k_value"),
    )


def decode_props_oracle() -> str:
    # regexp-based extraction keeps the oracle independent of DuckDB's
    # JSON extension availability; values are {"k": <int>}.
    return r"""
        SELECT event_id,
               CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k_value
        FROM events
    """


def props_bucket_rollup(events: DataFrame) -> DataFrame:
    """Decode + aggregate: event counts and exact value sums per decile
    bucket of the JSON ``k`` field — decode feeding a grouped plan."""
    k = F.from_json(F.col("props"), EVENT_PROPS_SCHEMA).getField("k")
    return (
        events.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_units"),
        )
        .select(
            "k_bucket",
            "n_events",
            (F.col("value_units") / F.lit(100.0)).alias("sum_value"),
        )
    )


def props_bucket_rollup_oracle() -> str:
    return r"""
        SELECT
            CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) % 10 AS k_bucket,
            COUNT(*) AS n_events,
            (SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0) AS sum_value
        FROM events
        GROUP BY 1
    """
