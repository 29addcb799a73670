"""Join operators (SURVEY.md §2.D).

The reference denormalizes instead of joining — the producer stamps
``device_name``/``location`` into every event (reference:
iot-cassandra-pipeline/src/producer.py:157-165) and the ``devices``
dimension table (reference: iot-cassandra-pipeline/cassandra/init.cql:63-74)
is never joined in code. This engine implements the join the schema
implies (J1, broadcast enrichment) plus the standard relational join
surface over the star-schema fixtures.

Scale notes (100 TB):
- Dimension enrichment is a *broadcast* hash join — the dim table ships
  once per executor, the fact table never shuffles. This is the J1 plan
  you want at any scale; we assert it in tests via the physical plan.
- Fact-to-fact joins (orders x lineitem) shuffle on the join key with
  map-side partial aggregation after; AQE handles skew. At rest, the
  recommended layout co-partitions both tables on the join key
  (bucketing), which removes the shuffle entirely — see
  storage.write_bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exactmath import exact_sum


def enrich_customers(
    customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """J1: dimension enrichment via broadcast hash joins — the analogue
    of joining events to ``devices`` for device_name/location.

    customer is the fact side; nation (25 rows) and region (5 rows) are
    broadcast. Zero shuffles on the fact table.
    """
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "c_mktsegment",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


def enrich_customers_oracle() -> str:
    return """
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
               n_name AS nation_name, r_name AS region_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """


def revenue_by_nation(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Fact-to-fact shuffle join + broadcast dims + grouped aggregation —
    the TPC-H Q5 shape. Exercises the full join pipeline the engine must
    sustain at scale: lineitem⋈orders shuffles on orderkey; nation (25
    rows at every scale) broadcast by hint; customer broadcast by the
    planner's size estimate. customer deliberately carries NO hint: it
    scales with the data (~15 B rows at 100 TB, far over the 8 GB /
    512 M-row broadcast cap), so a forced broadcast would fail the
    query at scale — the estimate picks BHJ at fixture scale (plan
    verified identical) and falls back to a shuffle join when customer
    outgrows spark.sql.autoBroadcastJoinThreshold.
    """
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            exact_sum(revenue, 2).alias("rev_units"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "nation_name",
            (F.col("rev_units") / F.lit(100.0)).alias("revenue"),
            "n_items",
        )
    )


def revenue_by_nation_oracle() -> str:
    return """
        SELECT n_name AS nation_name,
               (SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join: customers having at least one order (EXISTS)."""
    return (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        ).select("c_custkey", "c_name", "c_mktsegment")
    )


def customers_with_orders_oracle() -> str:
    return """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join: customers with no orders (NOT EXISTS)."""
    return (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        ).select("c_custkey", "c_name", "c_mktsegment")
    )


def customers_without_orders_oracle() -> str:
    return """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """


def customer_order_presence(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi + anti join in one driver-checkable plan: every customer
    tagged with whether it has orders — the EXISTS branch is the
    left-semi join, the NOT EXISTS branch the left-anti join, unioned
    with disjoint tags (so each branch keeps its own join semantics)."""
    return (
        customers_with_orders(customer, orders)
        .select(F.lit(True).alias("has_orders"), "c_custkey", "c_name", "c_mktsegment")
        .unionByName(
            customers_without_orders(customer, orders).select(
                F.lit(False).alias("has_orders"),
                "c_custkey",
                "c_name",
                "c_mktsegment",
            )
        )
    )


def customer_order_presence_oracle() -> str:
    return f"""
        SELECT TRUE AS has_orders, c_custkey, c_name, c_mktsegment
        FROM ({customers_with_orders_oracle()})
        UNION ALL
        SELECT FALSE AS has_orders, c_custkey, c_name, c_mktsegment
        FROM ({customers_without_orders_oracle()})
    """


def order_fulfillment(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Left outer join + aggregation: per-order line counts including
    orders with no lineitems (null-preserving side of the join surface)."""
    li = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        exact_sum(F.col("l_quantity"), 2).alias("qty_units"),
    )
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            (F.coalesce(F.col("qty_units"), F.lit(0)) / F.lit(100.0)).alias(
                "total_qty"
            ),
        )
    )


def order_fulfillment_oracle() -> str:
    return """
        SELECT o_orderkey, o_orderstatus,
               COALESCE(n_lines, 0) AS n_lines,
               (COALESCE(qty_units, 0) / 100.0) AS total_qty
        FROM orders
        LEFT JOIN (
            SELECT l_orderkey,
                   COUNT(*) AS n_lines,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_units
            FROM lineitem
            GROUP BY l_orderkey
        ) li ON o_orderkey = l_orderkey
    """


def shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """TPC-H Q3 shape: top unshipped orders by revenue for a market
    segment — selective filters pushed to all three scans, two joins,
    grouped exact revenue, top-k."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1995-03-15"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1995-03-15"))
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority",
        )
        .agg(exact_sum(revenue, 2).alias("rev_units"))
        .select(
            "o_orderkey",
            (F.col("rev_units") / F.lit(100.0)).alias("revenue"),
            "o_orderdate_s",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def shipping_priority_oracle(k: int = 10) -> str:
    return f"""
        SELECT o_orderkey,
               (SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT))
                   / 100.0) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT {k}
    """


def forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: a pure scan-filter-aggregate (no join) — the
    predicate-pushdown showcase; all three filters reach the parquet
    scan."""
    revenue = F.col("l_extendedprice") * F.col("l_discount")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(exact_sum(revenue, 4).alias("rev_units"))
        .select((F.col("rev_units") / F.lit(10000.0)).alias("forecast_revenue"))
    )


def forecast_revenue_oracle() -> str:
    return """
        SELECT (SUM(CAST(ROUND((l_extendedprice * l_discount) * 10000) AS BIGINT))
                   / 10000.0) AS forecast_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """
