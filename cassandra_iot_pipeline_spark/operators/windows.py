"""Row-window analytics (SURVEY.md §2.F extended surface).

The reference's only window need is latest-N (serving.py); a complete
engine also ships running aggregates, lag/lead, and sessionization —
all native Catalyst window functions, one shuffle on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user event-time running totals: cumulative exact value sum +
    row index. The canonical ordered-window plan (shuffle on user_id,
    in-partition sort, no global sort)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    units = F.round(F.col("value") * 100).cast("long")
    return events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.row_number().over(w).alias("seq"),
        (
            F.sum(units).over(w.rowsBetween(Window.unboundedPreceding, 0))
            / F.lit(100.0)
        ).alias("running_value"),
    )


def running_user_totals_oracle() -> str:
    return """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               ROW_NUMBER() OVER w AS seq,
               (SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / 100.0) AS running_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


def event_gaps(events: DataFrame) -> DataFrame:
    """lag(): inter-arrival gap per user in seconds (integer-exact)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    return events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        # floor, mirrored in the oracle: Spark's cast(double->long)
        # truncates while DuckDB's CAST rounds — never compare casts of
        # fractional values across engines
        F.floor((F.unix_micros(F.col("ts")) - prev_us) / F.lit(1000000))
        .cast("long")
        .alias("gap_s"),
    )


def event_gaps_oracle() -> str:
    return """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(FLOOR((epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
               )) / 1000000) AS BIGINT) AS gap_s
        FROM events
    """


def user_event_metrics(events: DataFrame) -> DataFrame:
    """`running_user_totals` + `event_gaps` fused into one window chain:
    row index, exact running value sum, and inter-arrival gap, all over
    the same (user_id, ts, event_id) ordering — Catalyst plans ONE
    shuffle + one sort for the three window functions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    units = F.round(F.col("value") * 100).cast("long")
    prev_us = F.lag(ts_us).over(w)
    return events.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        F.row_number().over(w).alias("seq"),
        (
            F.sum(units).over(w.rowsBetween(Window.unboundedPreceding, 0))
            / F.lit(100.0)
        ).alias("running_value"),
        # floor mirrored in the oracle (cast truncation differs across
        # engines; see event_gaps)
        F.floor((ts_us - prev_us) / F.lit(1000000)).cast("long").alias("gap_s"),
    )


def user_event_metrics_oracle() -> str:
    return """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               ROW_NUMBER() OVER w AS seq,
               (SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / 100.0) AS running_value,
               CAST(FLOOR((epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000)
                   AS BIGINT) AS gap_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


SESSION_GAP_S = 1800  # 30 minutes


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Sessionization: a new session starts when the inter-arrival gap
    exceeds ``gap_s``. Two stacked windows (lag -> boundary flag ->
    running count), both over the same (user_id, ts) partitioning, so
    Catalyst plans ONE shuffle + one sort for the whole chain."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    prev = F.lag(ts_us).over(w)
    is_new = F.when(
        prev.isNull() | ((ts_us - prev) > gap_s * 1_000_000), 1
    ).otherwise(0)
    with_flag = events.select(
        "user_id", "event_id", F.col("ts"), is_new.alias("is_new")
    )
    session_id = F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return with_flag.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        session_id.cast("long").alias("session_id"),
    )


def sessionize_oracle(gap_s: int = SESSION_GAP_S) -> str:
    return f"""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(SUM(is_new) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                        ) IS NULL
                        OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                        ) > {gap_s * 1_000_000}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    """


def session_stats(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Session-level rollup: length, span, exact value sum per session."""
    s = sessionize(events, gap_s)
    return (
        s.join(
            events.select(
                "event_id", F.round(F.col("value") * 100).cast("long").alias("units")
            ),
            "event_id",
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.sum("units").alias("units"),
        )
        .select(
            "user_id",
            "session_id",
            "n_events",
            "start_us",
            "end_us",
            F.floor((F.col("end_us") - F.col("start_us")) / F.lit(1000000))
            .cast("long")
            .alias("span_s"),
            (F.col("units") / F.lit(100.0)).alias("session_value"),
        )
    )


def session_stats_oracle(gap_s: int = SESSION_GAP_S) -> str:
    return f"""
        WITH sess AS ({sessionize_oracle(gap_s)})
        SELECT s.user_id, s.session_id,
               COUNT(*) AS n_events,
               MIN(s.ts_us) AS start_us,
               MAX(s.ts_us) AS end_us,
               CAST(FLOOR((MAX(s.ts_us) - MIN(s.ts_us)) / 1000000) AS BIGINT) AS span_s,
               (SUM(CAST(ROUND(e.value * 100) AS BIGINT)) / 100.0) AS session_value
        FROM sess s JOIN events e ON s.event_id = e.event_id
        GROUP BY s.user_id, s.session_id
    """


def type_pivot(events: DataFrame) -> DataFrame:
    """Pivot: per-user event counts by type as columns. Fixed pivot
    domain (the five fixture types) keeps the plan a single hash
    aggregate — no distinct-scan pre-pass, which matters at scale."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select(
            "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in types]
        )
    )


def type_pivot_oracle() -> str:
    # CAST to BIGINT: DuckDB's SUM over integers yields HUGEINT, which
    # fetchdf() materializes as float64 — hash-mismatching Spark's int64
    # even when every count is identical (CORRECTNESS_r02 root cause).
    cols = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN 1 END), 0)"
        f" AS BIGINT) AS n_{t}"
        for t in ["click", "error", "purchase", "signup", "view"]
    )
    return f"SELECT user_id, {cols} FROM events GROUP BY user_id"


def session_window_stats(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Native ``session_window`` sessions (the streaming-capable form —
    the same groupBy works under withWatermark in Structured Streaming).

    Boundary semantics differ from :func:`sessionize` by one epsilon:
    session_window merges an event iff it lands strictly inside
    [ts, ts+gap), i.e. a new session starts when the gap is >= gap_s
    (sessionize uses > gap_s). The oracle mirrors the >= rule. The
    emitted window end is last_event + gap (Spark's session contract).
    """
    units = F.round(F.col("value") * 100).cast("long")
    return (
        events.groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), f"{gap_s} seconds").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(units).alias("units"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("start_us"),
            F.unix_micros(F.col("sw.end")).alias("end_us"),
            "n_events",
            (F.col("units") / F.lit(100.0)).alias("session_value"),
        )
    )


def session_window_stats_oracle(gap_s: int = SESSION_GAP_S) -> str:
    return f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                           >= {gap_s * 1_000_000}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM flagged
        )
        SELECT user_id,
               MIN(epoch_us(ts)) AS start_us,
               MAX(epoch_us(ts)) + {gap_s * 1_000_000} AS end_us,
               COUNT(*) AS n_events,
               (SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0) AS session_value
        FROM sess
        GROUP BY user_id, sid
    """


def type_unpivot(pivoted: DataFrame) -> DataFrame:
    """UNPIVOT (melt) — the inverse of :func:`type_pivot`: the wide
    per-user count columns back to tall (user_id, event_type, n) rows.
    Spark's native ``unpivot`` compiles to a Generate (Expand) — one
    narrow map-side pass, no shuffle, no UDF. Zero-count cells are
    dropped (they exist only as pivot fill), so
    ``type_unpivot(type_pivot(e))`` round-trips exactly to the plain
    groupBy counts — pinned in tests and by the oracle."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        pivoted.unpivot(
            ["user_id"],
            [f"n_{t}" for t in types],
            "event_type",
            "n",
        )
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
        .filter(F.col("n") > 0)
    )


def type_unpivot_oracle() -> str:
    """DuckDB twin of ``type_unpivot(type_pivot(events))`` — which is
    by construction the plain per-(user, type) count."""
    return """
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
    """
