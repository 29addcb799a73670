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


def skew_report(
    df: DataFrame,
    key_cols: str | Sequence[str] = "user_id",
    top_n: int = 10,
) -> DataFrame:
    """(key..., n_rows, share, cum_share): the ``top_n`` heaviest keys
    with their exact row counts, their share of ALL rows, and the
    running share — the audit that decides whether an aggregation
    needs the salted path or a join needs AQE's skew split ("is one
    device 30% of the corpus, or is the fleet flat?").

    Determinism: ties on n_rows break by the key values ascending.
    Exactness: counts are exact integers; ``share`` is one IEEE
    division against the exact total, ``cum_share`` one division of
    the exact integer running sum (both mirrored by the oracle).

    100 TB shape: one partial-aggregable groupBy over the keys, then
    TakeOrderedAndProject for the top-N (never a full sort) and a
    one-row broadcast of the grand total onto N rows. The only wide
    exchange carries one row per distinct key per task."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_tot"))
    top = counts.orderBy(
        F.col("n_rows").desc(), *[F.col(k) for k in keys]
    ).limit(top_n)
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.col("n_rows").desc(), *[F.col(k) for k in keys])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("_tot")).alias("share"),
            (F.sum("n_rows").over(w).cast("double") / F.col("_tot")).alias(
                "cum_share"
            ),
        )
    )


def skew_summary(
    df: DataFrame, key_cols: str | Sequence[str] = "user_id"
) -> DataFrame:
    """One row: (n_keys, n_rows, max_key_rows, mean_key_rows,
    skew_factor) — ``skew_factor`` is the heaviest key's rows over the
    mean per-key rows (1.0 = perfectly flat; the salting docstring's
    decision number). mean and factor are the only IEEE ops, mirrored
    by the oracle."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    mean = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    return (
        counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_key_rows"),
        )
        .select(
            "n_keys",
            "n_rows",
            "max_key_rows",
            mean.alias("mean_key_rows"),
            (F.col("max_key_rows").cast("double") / mean).alias(
                "skew_factor"
            ),
        )
    )


def skew_report_oracle(
    table: str = "events",
    key_cols: Sequence[str] = ("user_id",),
    top_n: int = 10,
) -> str:
    """DuckDB twin of :func:`skew_report` (same tie order, same
    exact-integer counts, same division sequence)."""
    ks = ", ".join(key_cols)
    order = "n_rows DESC, " + ", ".join(key_cols)
    return f"""
        WITH counts AS (
            SELECT {ks}, COUNT(*) AS n_rows
            FROM {table}
            GROUP BY {ks}
        ),
        tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM counts),
        top AS (
            SELECT {ks}, n_rows FROM counts ORDER BY {order} LIMIT {top_n}
        )
        SELECT {ks}, n_rows,
               CAST(n_rows AS DOUBLE) / t AS share,
               CAST(CAST(SUM(n_rows) OVER (ORDER BY {order}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS DOUBLE) / t AS cum_share
        FROM top, tot
    """


def skew_summary_oracle(
    table: str = "events", key_cols: Sequence[str] = ("user_id",)
) -> str:
    """DuckDB twin of :func:`skew_summary`."""
    ks = ", ".join(key_cols)
    return f"""
        WITH counts AS (
            SELECT {ks}, COUNT(*) AS n FROM {table} GROUP BY {ks}
        )
        SELECT COUNT(*) AS n_keys,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               MAX(n) AS max_key_rows,
               CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_key_rows,
               CAST(MAX(n) AS DOUBLE)
                   / (CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                   AS skew_factor
        FROM counts
    """
