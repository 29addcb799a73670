"""Serving-read operators (SURVEY.md §2.C filters, §2.F ranking windows,
§2.G sort/limit/top-k).

These are the reads the reference's Cassandra schema is explicitly
designed for: partition-key point lookups, per-device time-range scans
(clustering key), and "most recent N per device" (the purpose of
``CLUSTERING ORDER BY timestamp DESC``, reference:
iot-cassandra-pipeline/cassandra/init.cql:25-26 and
monitoring/cassandra_latency_check.py:13).

In Spark these become Catalyst filters (pushed to the parquet scan —
row-group min/max pruning replaces Cassandra's partition-key routing)
and ranking window functions. Every ORDER BY carries a unique tiebreak
column so results are total-ordered and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def point_lookup(events: DataFrame, device_id: int, limit: int = 100) -> DataFrame:
    """F1 + O1 + O2: the reference's latency-probe read
    ``SELECT ... WHERE device_id = ? LIMIT 100`` over DESC-clustered rows
    (reference: iot-cassandra-pipeline/monitoring/cassandra_latency_check.py:13).

    Catalyst compiles orderBy+limit to TakeOrderedAndProject — a top-k
    that never globally sorts; the equality predicate is pushed to the
    parquet scan.
    """
    return (
        events.filter(F.col("user_id") == F.lit(device_id))
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .select(
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .limit(limit)
    )


def point_lookup_oracle(device_id: int, limit: int = 100) -> str:
    return f"""
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        FROM events
        WHERE user_id = {device_id}
        ORDER BY ts DESC, event_id DESC
        LIMIT {limit}
    """


def range_scan(
    events: DataFrame, device_id: int, start_ts: str, end_ts: str
) -> DataFrame:
    """F2: per-device time-range read — the clustering-key range scan the
    sensor_events layout serves (reference:
    iot-cassandra-pipeline/cassandra/init.cql:25-26;
    docs/baseline-architecture.md:108-109)."""
    return (
        events.filter(
            (F.col("user_id") == F.lit(device_id))
            & F.col("ts").between(F.lit(start_ts), F.lit(end_ts))
        )
        .select(
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .orderBy(F.col("ts_us").desc(), F.col("event_id").desc())
    )


def range_scan_oracle(device_id: int, start_ts: str, end_ts: str) -> str:
    return f"""
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        FROM events
        WHERE user_id = {device_id}
          AND ts BETWEEN TIMESTAMP '{start_ts}' AND TIMESTAMP '{end_ts}'
        ORDER BY ts_us DESC, event_id DESC
    """


def categorical_filter(events: DataFrame, event_type: str) -> DataFrame:
    """F3: the secondary-index read ``WHERE location = ?`` (reference:
    iot-cassandra-pipeline/cassandra/init.cql:81-82) — in Spark a plain
    pushed-down equality predicate; parquet column stats + dictionary
    filtering replace the index."""
    return events.filter(F.col("event_type") == F.lit(event_type)).select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


def categorical_filter_oracle(event_type: str) -> str:
    return f"""
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        FROM events
        WHERE event_type = '{event_type}'
    """


def latest_n_per_device(events: DataFrame, n: int = 3) -> DataFrame:
    """§2.F: "most recent N events per device" — the read pattern the
    DESC clustering order exists for, as a ranking window. One shuffle
    on device_id; no global sort."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "event_type",
            "value",
            "rn",
        )
    )


def latest_n_per_device_oracle(n: int = 3) -> str:
    return f"""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value, rn
        FROM (
            SELECT user_id, event_id, ts, event_type, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn <= {n}
    """


def top_k_orders(orders: DataFrame, k: int = 10) -> DataFrame:
    """O1+O2 over the star schema: global top-k by total price
    (TakeOrderedAndProject — heap-based, never a full sort at scale)."""
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
        )
        .limit(k)
    )


def top_k_orders_oracle(k: int = 10) -> str:
    return f"""
        SELECT o_orderkey, o_custkey, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT {k}
    """
