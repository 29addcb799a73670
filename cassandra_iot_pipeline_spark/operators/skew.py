"""Skew-aware aggregation (100 TB posture).

AQE's skew-join splitting handles skewed *joins* automatically
(spark.sql.adaptive.skewJoin.enabled, on in build_session). Skewed
*aggregations* — one device producing a large share of all events, the
classic hot-key problem in IoT — are handled here with two-phase salted
aggregation: shard each hot key across ``n_salts`` reducers, partially
aggregate per shard, then merge shards. The final shuffle carries only
``n_salts`` rows per key.

Works for any algebraic aggregate (sum/count/min/max decompose); exposed
for the engine's exact integer-units measures so salted and plain
results are bit-identical (integer merges are order-free) — asserted in
tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_hourly_rollup(
    events: DataFrame,
    n_salts: int = 8,
    device_col: str = "user_id",
    ts_col: str = "ts",
    measure_col: str = "value",
) -> DataFrame:
    """hourly_rollup with a salted first phase — same output contract,
    bit-identical results (see operators/agg.py::hourly_rollup)."""
    salt = F.pmod(F.xxhash64(F.col("event_id")), F.lit(n_salts))
    units = F.round(F.col(measure_col) * 100).cast("long")
    phase1 = (
        events.groupBy(
            F.col(device_col).alias("device_id"),
            F.unix_timestamp(F.date_trunc("hour", F.col(ts_col)))
            .cast("long")
            .alias("hour_bucket"),
            salt.alias("__salt"),
        )
        .agg(
            F.sum(units).alias("s_units"),
            F.max(measure_col).alias("s_max"),
            F.min(measure_col).alias("s_min"),
            F.count(F.lit(1)).alias("s_count"),
        )
    )
    return (
        phase1.groupBy("device_id", "hour_bucket")
        .agg(
            F.sum("s_units").alias("sum_units"),
            F.max("s_max").alias("max_value"),
            F.min("s_min").alias("min_value"),
            F.sum("s_count").alias("event_count"),
        )
        .select(
            "device_id",
            "hour_bucket",
            (F.col("sum_units") / F.lit(100.0) / F.col("event_count")).alias(
                "avg_value"
            ),
            "max_value",
            "min_value",
            "event_count",
        )
    )


def salted_count_distinct(
    df: DataFrame, group_cols: Sequence[str], distinct_col: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase distinct count for skewed groups: phase 1 dedups
    (group, value) per salt shard; phase 2 merges shard counts. Exact,
    never materializes a hot group on one reducer."""
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    phase1 = (
        df.select(*group_cols, F.col(distinct_col), salt.alias("__salt"))
        .groupBy(*group_cols, "__salt")
        .agg(F.count_distinct(F.col(distinct_col)).alias("s_distinct"))
    )
    # value-hash salting shards each distinct value to exactly one
    # shard, so shard counts add up exactly
    return phase1.groupBy(*group_cols).agg(
        F.sum("s_distinct").cast("long").alias("n_distinct")
    )
