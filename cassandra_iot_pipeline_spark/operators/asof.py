"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics: for each left row, attach the single right row with the same
key and the greatest right-time <= left-time (the "latest state as of
then" join used for rates, dimensions-over-time, feature lookup).

Implementation is the scalable union-tag algorithm, all Catalyst:

1. UNION the two sides with a tag (right rows carry their payload,
   left rows carry null payload);
2. one window over (key, time, tag): ``last(payload, ignorenulls)``
   forward-fills each left row with the most recent right payload;
3. keep the left rows.

One shuffle on the key, one in-partition sort — the same cost as a
sort-merge join, with none of the range-explosion a theta-join would
have. (The naive equi-join + filter + row_number alternative multiplies
each left row by all earlier right rows before ranking.) DuckDB ships a
native ASOF JOIN, which is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Generic as-of join (left rows enriched with latest right payload
    at or before their time). Output: all left columns + payload_cols.

    All payload columns travel as ONE struct through the
    ``last(ignorenulls)`` fill, so every output row's payload comes from
    the same (latest) right row — a right row whose payload column is
    legitimately NULL keeps that NULL instead of inheriting the value
    from an older right row (which per-column fills would mix)."""
    from pyspark.sql import types as T

    payload_type = T.StructType([
        T.StructField(c, right.schema[c].dataType, True) for c in payload_cols
    ])
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(l_tag.schema["__left"].dataType)
        .alias("__left"),
        F.struct(*[F.col(c) for c in payload_cols]).cast(payload_type).alias(
            "__payload"
        ),
    )
    # right rows sort before left rows at identical times (tag 0 < 1),
    # so a right row AT the left timestamp is visible to it (<=).
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "__is_left",
        "__left",
        F.last(F.col("__payload"), ignorenulls=True).over(w).alias("__payload"),
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col("__left").getField(c).alias(c) for c in left.columns],
        *[F.col("__payload").getField(c).alias(c) for c in payload_cols],
    )


def latest_order_asof(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Fixture binding: for each event, the user's most recent order
    state (key, price, status) as of the event time."""
    from .upsert import latest_by_pk

    # Multiple orders can share (custkey, orderdate); as-of must resolve
    # ties deterministically. Both engines keep the max orderkey per
    # (custkey, day) before the as-of.
    right = latest_by_pk(
        orders.select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("odate"),
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_totalprice").alias("asof_totalprice"),
        ),
        pk=("user_id", "odate"),
        version_col="asof_orderkey",
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts"),
        right,
        key="user_id",
        left_time="ts",
        right_time="odate",
        payload_cols=["asof_orderkey", "asof_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "asof_orderkey",
        "asof_totalprice",
    )


def latest_order_asof_oracle() -> str:
    # DuckDB native ASOF JOIN is the oracle. Both engines first dedup to
    # one order per (custkey, day) — max orderkey wins — because as-of
    # ties on the inequality column would otherwise be arbitrary.
    return """
        WITH best_per_day AS (
            SELECT o_custkey, o_orderdate, asof_orderkey, asof_totalprice
            FROM (
                SELECT o_custkey, o_orderdate,
                       o_orderkey AS asof_orderkey,
                       o_totalprice AS asof_totalprice,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey, o_orderdate
                           ORDER BY o_orderkey DESC
                       ) AS rn
                FROM orders
            ) WHERE rn = 1
        )
        SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
               o.asof_orderkey, o.asof_totalprice
        FROM events e
        ASOF LEFT JOIN best_per_day o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """
