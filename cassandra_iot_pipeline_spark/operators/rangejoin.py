"""Range (interval) join — an operator Spark lacks natively.

Semantics: left row joins right rows with the same key whose time falls
in (left_time, left_time + window]. The naive formulation is an
equi-join on the key plus a range predicate — Catalyst executes that as
a join with a post-filter, which explodes when keys are hot (every
same-key pair materializes before filtering).

The scalable plan bucketizes time by the window length: a right row in
(t, t+w] lives in the same or the next w-bucket as t, so joining on
(key, bucket) with the right side duplicated into {bucket, bucket+1}
bounds the candidate set to two buckets per left row, then the exact
range predicate filters. One shuffle on (key, bucket); candidate volume
is O(rows-per-bucket), not O(rows-per-key)^2.

Fixture binding: conversion pairs — a 'view' followed by a 'purchase'
by the same user within one hour. Oracle: DuckDB's native inequality
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_S = 3600


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    window_s: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Generic bucketized range join: pairs where
    right_time in (left_time, left_time + window_s]."""
    l_b = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__lt"),
        *[F.col(c) for c in left_cols],
    ).withColumn(
        "__bucket", F.expr(f"unix_micros(__lt) DIV {window_s * 1_000_000}")
    )
    r_src = right.select(
        F.col(key).alias("__k2"),
        F.col(right_time).alias("__rt"),
        *[F.col(c) for c in right_cols],
    )
    r_b = r_src.withColumn(
        "__rbucket", F.expr(f"unix_micros(__rt) DIV {window_s * 1_000_000}")
    ).withColumn("__bucket", F.explode(F.array(F.col("__rbucket") - 1, F.col("__rbucket"))))
    joined = l_b.join(
        r_b,
        (F.col("__k") == F.col("__k2")) & (l_b["__bucket"] == r_b["__bucket"]),
    ).filter(
        (F.col("__rt") > F.col("__lt"))
        & (
            F.unix_micros(F.col("__rt"))
            <= F.unix_micros(F.col("__lt")) + window_s * 1_000_000
        )
    )
    return joined.select(
        F.col("__k").alias(key),
        *[F.col(c) for c in left_cols],
        *[F.col(c) for c in right_cols],
    )


def conversion_pairs(events: DataFrame, window_s: int = WINDOW_S) -> DataFrame:
    """view -> purchase by the same user within one hour (the funnel
    query): every qualifying (view, purchase) pair with the gap."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    paired = range_join(
        views,
        purchases,
        key="user_id",
        left_time="view_ts",
        right_time="purchase_ts",
        window_s=window_s,
        left_cols=["view_event_id", "view_ts"],
        right_cols=["purchase_event_id", "purchase_ts", "purchase_value"],
    )
    return paired.select(
        "user_id",
        "view_event_id",
        "purchase_event_id",
        F.unix_micros(F.col("view_ts")).alias("view_us"),
        F.unix_micros(F.col("purchase_ts")).alias("purchase_us"),
        F.floor(
            (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("view_ts")))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("gap_s"),
        "purchase_value",
    )


def conversion_pairs_oracle(window_s: int = WINDOW_S) -> str:
    return f"""
        SELECT v.user_id,
               v.event_id AS view_event_id,
               p.event_id AS purchase_event_id,
               epoch_us(v.ts) AS view_us,
               epoch_us(p.ts) AS purchase_us,
               CAST(FLOOR((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000) AS BIGINT)
                   AS gap_s,
               p.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON v.user_id = p.user_id
         AND p.ts > v.ts
         AND epoch_us(p.ts) <= epoch_us(v.ts) + {window_s * 1_000_000}
    """
