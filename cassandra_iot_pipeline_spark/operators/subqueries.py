"""Subquery surface: scalar subqueries, correlated-subquery
decorrelation, and pattern-match filters.

The reference has no subqueries; a complete engine ships them because
Catalyst's subquery machinery (scalar subquery broadcast, correlated
decorrelation into aggregated joins) is exactly what replaces hand-built
two-pass jobs at scale. All thresholds use exact integer-units
arithmetic so comparisons never straddle a float boundary across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exactmath import exact_sum


def above_avg_balance(customer: DataFrame) -> DataFrame:
    """Scalar subquery: customers with balance above the global average.
    The scalar aggregate computes once and broadcasts into the filter —
    one extra stage, not a per-row subquery."""
    avg_units = customer.agg(
        (exact_sum(F.col("c_acctbal"), 2) / F.lit(100.0) / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        customer.crossJoin(F.broadcast(avg_units))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


def above_avg_balance_oracle() -> str:
    return """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 / COUNT(*)
            FROM customer
        )
    """


def priority_exists_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Q4 shape: EXISTS-correlated subquery decorrelated to a left-semi
    join, then counts per priority class. The semi join never widens the
    orders side (each order emitted at most once however many returned
    lineitems it has) and the probe side reduces to the 8-byte key
    before shuffling — the decorrelation Catalyst applies to EXISTS is
    exactly this plan, written out."""
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    qualified = orders.join(
        returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def priority_exists_counts_oracle() -> str:
    return """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
        )
        GROUP BY o_orderpriority
    """


def returnflag_priority_mix(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Q12 shape: fact-fact join + dual conditional counts — per
    returnflag, how many lineitems belong to high- vs low-priority
    orders. The CASE-WHEN counts fold into one aggregation pass (no
    pivot, no second scan); integer counts are engine-exact."""
    j = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
    )


def returnflag_priority_mix_oracle() -> str:
    return """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag
    """


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Correlated-subquery decorrelation (TPC-H Q17 shape): revenue from
    lineitems whose quantity is below 20% of the average quantity for
    their part. Expressed as the decorrelated plan Catalyst would
    produce: per-part aggregate -> broadcast join -> filter -> global
    exact sum. The per-part threshold uses integer-units avg so the
    comparison is bit-identical across engines.

    Neither join side carries a broadcast hint (r13): both scale with
    part's cardinality (~2 B rows at 100 TB — over the broadcast cap),
    so a forced broadcast would fail at scale. The planner's size
    estimate picks BHJ at fixture scale (plan verified identical); at
    scale the joins become shuffle joins and the selective p_brand
    filter makes brand_parts the creation side of a runtime Bloom
    filter on l_partkey (session.py bloom confs; §3.2) that drops
    ~24/25ths of lineitem before its shuffle."""
    per_part = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            exact_sum(F.col("l_quantity"), 2)
            / F.lit(100.0)
            / F.count(F.lit(1))
            * F.lit(0.2)
        ).alias("qty_threshold")
    )
    brand_parts = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        lineitem.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(exact_sum(F.col("l_extendedprice"), 2).alias("rev_units"))
        .select(
            (F.col("rev_units") / F.lit(100.0) / F.lit(7.0)).alias("avg_yearly")
        )
    )


def small_quantity_revenue_oracle() -> str:
    return """
        SELECT (SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0)
                   AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT SUM(CAST(ROUND(l2.l_quantity * 100) AS BIGINT))
                         / 100.0 / COUNT(*) * 0.2
              FROM lineitem l2
              WHERE l2.l_partkey = lineitem.l_partkey
          )
    """


def part_name_search(part: DataFrame) -> DataFrame:
    """Pattern-match filters: LIKE containment + a regexp over p_type,
    aggregated by brand — the text-predicate surface (the engine's form
    of the reference's secondary-index reads over low-cardinality
    strings)."""
    return (
        part.filter(
            F.col("p_name").contains("a")
            & F.col("p_type").rlike("^(STANDARD|LARGE)")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            exact_sum(F.col("p_retailprice"), 2).alias("price_units"),
        )
        .select(
            "p_brand",
            "n_parts",
            (F.col("price_units") / F.lit(100.0)).alias("total_price"),
        )
    )


def part_name_search_oracle() -> str:
    return """
        SELECT p_brand,
               COUNT(*) AS n_parts,
               (SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) / 100.0)
                   AS total_price
        FROM part
        WHERE p_name LIKE '%a%'
          AND regexp_matches(p_type, '^(STANDARD|LARGE)')
        GROUP BY p_brand
    """
