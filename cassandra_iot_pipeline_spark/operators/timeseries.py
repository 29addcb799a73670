"""Hypertable serving primitives over raw event points — the
irregular-sample siblings of the bucketed gap-fill (operators/
gapfill.py): time-weighted averages and counter rates.

Why these two: the reference's consumers read hourly AVG/MAX/MIN
rollups (iot-cassandra-pipeline/src/spark_consumer.py:169-186), which
silently assume samples arrive uniformly — a device reporting 59
minutes of 20.0 and 1 minute of 80.0 averages to 50.0 under COUNT
weighting but 21.0 under time weighting. TimescaleDB ships exactly
this pair (`time_weight('LOCF', ...)`, `rate`/`delta` on counters) as
its hyperfunction core; this module re-expresses them as pure-Catalyst
window plans with the repo's exactness discipline.

Plan shape (both): ONE raw scan, one shuffle into the per-key window
sort, lead()/lag() pairing, then a partial-aggregable groupBy — the
same lead()-anchored pattern as the gap-fill, no joins, no second
scan. Integral numerators are BIGINT (units x whole seconds), so
partial aggregation order cannot perturb the result; the single final
division per key is one correctly-rounded IEEE op (deterministic, the
exactmath.py rule).

NULL measures are filtered before pairing (the gap-fill's r5 ADVICE
posture): a NULL sample neither anchors an interval nor resets a
counter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import exactmath


def _keys(key: str | Sequence[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def time_weighted_avg(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts_col: str = "ts",
    value: str | Column = "value",
    scale: int = 2,
) -> DataFrame:
    """LOCF time-weighted average per key over each key's observed span
    — TimescaleDB's ``time_weight('LOCF', ts, value)`` semantics: each
    observation holds until the next one, so its weight is the seconds
    to its successor; the last observation closes the span with weight
    0. Keys with a single observation (span 0) report that
    observation's value exactly — the 0/0 integral's LOCF limit.

    Output: (key..., span_secs, n_samples, tw_avg) where ``tw_avg`` is
    the integral of the step function divided by the span, in the
    measure's own scale. Numerator is exact BIGINT (units x seconds);
    the one division per key is correctly rounded.

    100 TB shape: one scan, one shuffle into the per-key window, then
    a partial-aggregable groupBy on the same key — the window exchange
    IS the aggregation's required clustering, so AQE plans a single
    wide stage. Ties on ``ts`` are ordered by the value's units for a
    deterministic step function regardless of partition layout."""
    keys = _keys(key)
    vcol = F.col(value) if isinstance(value, str) else value
    units = exactmath.units(vcol, scale)
    pts = df.filter(vcol.isNotNull()).select(
        *keys,
        F.unix_timestamp(F.col(ts_col)).alias("t"),
        units.alias("u"),
    )
    w = Window.partitionBy(*keys).orderBy("t", "u")
    paired = pts.select(
        *keys,
        "t",
        "u",
        F.lead("t").over(w).alias("t_next"),
    )
    # weight = seconds this sample is the latest one; last sample -> 0.
    # Exactly one row per key has a NULL lead (the order-final sample),
    # so its value survives as MAX over the otherwise-NULL column — the
    # span-closing sample without a second window pass.
    weighted = paired.select(
        *keys,
        "u",
        (F.coalesce(F.col("t_next"), F.col("t")) - F.col("t")).alias("dt"),
        F.when(F.col("t_next").isNull(), F.col("u")).alias("u_last"),
    )
    agg = weighted.groupBy(*keys).agg(
        F.sum(F.col("u") * F.col("dt")).alias("num"),
        F.sum("dt").alias("span_secs"),
        F.count(F.lit(1)).alias("n_samples"),
        F.max("u_last").alias("last_u"),
    )
    divisor = F.lit(float(10**scale))
    tw = F.when(
        F.col("span_secs") > 0,
        F.col("num").cast("double") / F.col("span_secs") / divisor,
    ).otherwise(F.col("last_u").cast("double") / divisor)
    return agg.select(
        *keys, "span_secs", "n_samples", tw.alias("tw_avg")
    )


def time_weighted_avg_oracle(
    table: str = "events",
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_expr: str = "value",
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`time_weighted_avg`: identical LOCF
    weighting, identical BIGINT numerator, identical tie order, one
    final division (epoch_us//1e6 truncates exactly like Spark's
    unix_timestamp)."""
    ks = ", ".join(keys)
    units = exactmath.oracle_units(value_expr, scale)
    div = float(10**scale)
    return f"""
        WITH pts AS (
            SELECT {ks},
                   epoch_us({ts_col}) // 1000000 AS t,
                   {units} AS u
            FROM {table}
            WHERE ({value_expr}) IS NOT NULL
        ),
        paired AS (
            SELECT {ks}, u,
                   COALESCE(LEAD(t) OVER w, t) - t AS dt,
                   CASE WHEN LEAD(t) OVER w IS NULL THEN u END AS u_last
            FROM pts
            WINDOW w AS (PARTITION BY {ks} ORDER BY t, u)
        )
        SELECT {ks},
               -- DuckDB SUM(BIGINT) is HUGEINT; BIGINT keeps the dtype
               -- class aligned with Spark's LONG (the type_pivot lesson)
               CAST(SUM(dt) AS BIGINT) AS span_secs,
               COUNT(*) AS n_samples,
               CASE WHEN SUM(dt) > 0
                    THEN CAST(SUM(u * dt) AS DOUBLE) / SUM(dt) / {div}
                    ELSE CAST(MAX(u_last) AS DOUBLE) / {div}
               END AS tw_avg
        FROM paired
        GROUP BY {ks}
    """


def counter_rate(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts_col: str = "ts",
    value: str | Column = "value",
    scale: int = 2,
) -> DataFrame:
    """Per-interval delta and rate of a monotonic counter with reset
    detection — the Prometheus/TimescaleDB ``rate()`` contract: a
    sample BELOW its predecessor means the counter reset, and the new
    reading itself is the interval's increase (the standard
    reset-recovery rule; partial pre-reset growth is unknowable and
    credited as 0).

    Output, one row per consecutive sample pair: (key..., ts_us,
    next_ts_us, delta_units BIGINT, secs DOUBLE, rate_per_sec DOUBLE).
    ``secs`` and the rate denominator derive from the MICROSECOND
    timestamps (r6 ADVICE: the old whole-second ``unix_timestamp``
    denominator reported rate 0.0 for two distinct samples inside one
    second and quantized sub-second intervals straddling a boundary);
    the only zero-duration pairs left are identical-microsecond
    timestamps, which report rate 0.0 rather than an infinity that
    would poison downstream sums — the delta is still carried. Sample
    order is (t_us, u) — pure event-time order, with the units as the
    deterministic tiebreak for identical microseconds, so the
    streaming form (streaming/rates.py) can be bit-identical, not
    just content-identical. ``secs`` is one exact int→double cast and
    one correctly-rounded division by 1e6; the rate divides through
    that same value (three IEEE ops total, mirrored by the oracle)."""
    keys = _keys(key)
    vcol = F.col(value) if isinstance(value, str) else value
    units = exactmath.units(vcol, scale)
    pts = df.filter(vcol.isNotNull()).select(
        *keys,
        F.unix_micros(F.col(ts_col)).alias("t_us"),
        units.alias("u"),
    )
    w = Window.partitionBy(*keys).orderBy("t_us", "u")
    paired = pts.select(
        *keys,
        "t_us",
        "u",
        F.lead("t_us").over(w).alias("t2_us"),
        F.lead("u").over(w).alias("u2"),
    ).filter(F.col("t2_us").isNotNull())
    delta = F.when(
        F.col("u2") >= F.col("u"), F.col("u2") - F.col("u")
    ).otherwise(F.col("u2"))  # reset: the new reading is the increase
    dus = F.col("t2_us") - F.col("t_us")
    secs = dus.cast("double") / F.lit(1e6)
    rate = F.when(
        dus > 0, delta.cast("double") / secs / F.lit(float(10**scale))
    ).otherwise(F.lit(0.0))
    return paired.select(
        *keys,
        F.col("t_us").alias("ts_us"),
        F.col("t2_us").alias("next_ts_us"),
        delta.alias("delta_units"),
        secs.alias("secs"),
        rate.alias("rate_per_sec"),
    )


def counter_rate_oracle(
    table: str = "events",
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_expr: str = "value",
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`counter_rate` (same reset rule, same
    integer units, same microsecond denominator, same zero-duration
    guard, same three-IEEE-op division sequence)."""
    ks = ", ".join(keys)
    units = exactmath.oracle_units(value_expr, scale)
    div = float(10**scale)
    return f"""
        WITH pts AS (
            SELECT {ks},
                   epoch_us({ts_col}) AS t_us,
                   {units} AS u
            FROM {table}
            WHERE ({value_expr}) IS NOT NULL
        ),
        paired AS (
            SELECT {ks}, t_us, u,
                   LEAD(t_us) OVER w AS t2_us,
                   LEAD(u) OVER w AS u2
            FROM pts
            WINDOW w AS (PARTITION BY {ks} ORDER BY t_us, u)
        )
        SELECT {ks},
               t_us AS ts_us,
               t2_us AS next_ts_us,
               CASE WHEN u2 >= u THEN u2 - u ELSE u2 END AS delta_units,
               CAST(t2_us - t_us AS DOUBLE) / 1000000.0 AS secs,
               CASE WHEN t2_us - t_us > 0
                    THEN CAST(CASE WHEN u2 >= u THEN u2 - u ELSE u2 END
                              AS DOUBLE)
                         / (CAST(t2_us - t_us AS DOUBLE) / 1000000.0)
                         / {div}
                    ELSE 0.0
               END AS rate_per_sec
        FROM paired
        WHERE t2_us IS NOT NULL
    """
