"""Statistical aggregates: exact quantiles, approximate sketches,
grouping sets (engine surface beyond the reference's avg/max/min/count).

Exactness: quantiles interpolate over *integer cents* at quarter
fractions (0.25/0.5/0.75), where linear interpolation is exact binary
arithmetic — bit-identical across engines. Approximate sketches
(approx_count_distinct, percentile_approx) are engine-specific by
nature; they ship as API surface with accuracy pinned in tests, not in
the oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANTILES = (0.25, 0.5, 0.75)


def value_quantiles(events: DataFrame) -> DataFrame:
    """Exact p25/p50/p75 of value per event_type, interpolated on
    integer cents (quarter-fraction interpolation is exact)."""
    cents = F.round(F.col("value") * 100).cast("long")
    pct = F.percentile(cents, F.lit(list(QUANTILES)))
    return (
        events.groupBy("event_type")
        .agg(pct.alias("q"))
        .select(
            "event_type",
            (F.col("q").getItem(0) / F.lit(100.0)).alias("p25"),
            (F.col("q").getItem(1) / F.lit(100.0)).alias("p50"),
            (F.col("q").getItem(2) / F.lit(100.0)).alias("p75"),
        )
    )


def value_quantiles_oracle() -> str:
    return """
        SELECT event_type,
               (quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.25) / 100.0) AS p25,
               (quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.50) / 100.0) AS p50,
               (quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.75) / 100.0) AS p75
        FROM events
        GROUP BY event_type
    """


def orders_cube(orders: DataFrame) -> DataFrame:
    """CUBE over (status, priority): all grouping-set combinations with
    exact cents totals — one pass, Catalyst Expand + hash aggregate."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("price_units"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            (F.col("price_units") / F.lit(100.0)).alias("total_price"),
        )
    )


def orders_cube_oracle() -> str:
    return """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               (SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """


def orders_rollup_hierarchy(orders: DataFrame) -> DataFrame:
    """ROLLUP over (status, priority): hierarchical subtotals (status
    totals + grand total, without priority-only rows) — the other
    grouping-sets shape, same single-pass Expand plan."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("price_units"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            (F.col("price_units") / F.lit(100.0)).alias("total_price"),
        )
    )


def orders_rollup_hierarchy_oracle() -> str:
    return """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               (SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """


def approx_user_count(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct-user estimate next to the exact count —
    the scale-path sketch (exact count_distinct shuffles every key;
    the sketch is fixed-size per partition). Engine-specific estimate:
    accuracy pinned by tests, not the oracle."""
    return events.agg(
        F.count_distinct(F.col("user_id")).alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
    )
