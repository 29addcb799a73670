"""Conversion attribution — which touch channels get credit for each
conversion, under the three standard models (first-touch, last-touch,
linear), within a lookback window.

Reference tie-in: the funnel (operators/funnel.py) asks whether users
progress through a prescribed order; attribution asks the inverse
product question over the same stream — given that a conversion
HAPPENED, which of the preceding touch events earns it. Together with
`event_transitions` they are the engagement family's three views.

Semantics, exactly: for each conversion event ``c`` (type =
``conversion_type``) of user ``u`` at microsecond ``t_c``, the
credited touches are the user's events with type in ``touch_types``
and ``t_c - lookback <= t < t_c`` (strictly before — a same-microsecond
touch does not credit itself, the funnel's strict-chain rule).

- first-touch: the earliest in-window touch — ties on the same
  microsecond break by ``tie_col``, a total order, so the winner is
  deterministic in both engines;
- last-touch: the latest, same tiebreak;
- linear: each touch EVENT carries ``1/n`` of the conversion (n = the
  conversion's in-window touch count), aggregated per channel.

Exactness: counts are BIGINTs. Linear credit is aggregated in integer
MICRO-credits — per (conversion, channel), ``ROUND(1e6 * cnt / n)``
is ONE deterministic double division + round (both engines compute
the identical correctly-rounded quotient; the exactmath units rule),
and the micro-credit SUM is an exact integer. The reported
``linear_credit`` is one final division. Conversions with NO
in-window touch are reported on a ``touch_type IS NULL`` row
(unattributed count) — dropped conversions would silently understate
the denominator.

Plan shape (pure Catalyst, the rangejoin bucket discipline): touches
and conversions equi-join on (user, lookback-sized time bucket) — a
conversion's window spans at most TWO buckets, so each conversion
probes two buckets and the exact range predicate filters after; no
unbounded range explosion, no per-user collect. Then ONE window over
conv_id (n, first/last keys ride the same exchange) and two bounded
aggregations (rows are conversions x channels).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: composite (ts, tie) ordering key base: ts * 2^64 + tie, exact in
#: DECIMAL(38,0) / HUGEINT in both engines
_KEY_BASE = 18446744073709551616


def attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """(touch_type, first_touch, last_touch, linear_units,
    linear_credit): per channel, how many conversions it opened
    (first-touch), how many it closed (last-touch), and its linear
    credit in micro-credits + credits. The ``touch_type IS NULL`` row
    counts unattributed conversions (no in-window touch; zeros
    elsewhere). See module docstring for exact semantics."""
    touch_types = list(touch_types)
    if not touch_types:
        raise ValueError("attribution needs at least one touch type")
    if conversion_type in touch_types:
        raise ValueError(
            "conversion_type must not be one of touch_types "
            f"(got {conversion_type!r} in {touch_types})"
        )
    lb_us = lookback_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))

    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(key).alias("k"),
        us.alias("cts"),
        F.col(tie_col).alias("conv_id"),
    )
    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(key).alias("k"),
        us.alias("tts"),
        F.col(type_col).alias("touch"),
        F.col(tie_col).alias("touch_id"),
        F.expr(f"(unix_micros({ts_col})) div {lb_us}").alias("b"),
    )
    # each conversion's window spans at most two lookback-sized
    # buckets: probe (its own bucket, the previous one)
    probes = convs.select(
        "k",
        "cts",
        "conv_id",
        F.explode(
            F.array(
                F.expr(f"cts div {lb_us}"), F.expr(f"cts div {lb_us}") - 1
            )
        ).alias("b"),
    )
    pairs = probes.join(touches, ["k", "b"]).filter(
        (F.col("tts") < F.col("cts"))
        & (F.col("tts") >= F.col("cts") - lb_us)
    )

    from decimal import Decimal

    ckey = (
        F.col("tts").cast("decimal(38,0)") * F.lit(Decimal(_KEY_BASE))
        + F.col("touch_id")
    ).alias("ordkey")
    w = Window.partitionBy("conv_id")
    enriched = pairs.select(
        "conv_id", "touch", ckey
    ).select(
        "conv_id",
        "touch",
        "ordkey",
        F.count(F.lit(1)).over(w).alias("n"),
        F.min_by("touch", "ordkey").over(w).alias("first_touch"),
        F.max_by("touch", "ordkey").over(w).alias("last_touch"),
    )
    per_conv_type = enriched.groupBy("conv_id", "touch").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("n").alias("n"),
        F.first("first_touch").alias("ft"),
        F.first("last_touch").alias("lt"),
    )
    attributed = per_conv_type.groupBy(F.col("touch").alias("touch_type")).agg(
        F.count(F.when(F.col("ft") == F.col("touch"), F.lit(1))).alias(
            "first_touch"
        ),
        F.count(F.when(F.col("lt") == F.col("touch"), F.lit(1))).alias(
            "last_touch"
        ),
        F.sum(
            F.round(F.lit(1_000_000) * F.col("cnt") / F.col("n")).cast(
                "long"
            )
        ).alias("linear_units"),
    )
    unattributed = (
        convs.join(pairs.select("conv_id").distinct(), "conv_id", "anti")
        .agg(F.count(F.lit(1)).alias("n_un"))
        .select(
            F.lit(None).cast("string").alias("touch_type"),
            F.col("n_un").alias("first_touch"),
            F.col("n_un").alias("last_touch"),
            F.lit(0).cast("long").alias("linear_units"),
        )
        .filter(F.col("first_touch") > 0)
    )
    return attributed.unionByName(unattributed).select(
        "touch_type",
        "first_touch",
        "last_touch",
        "linear_units",
        (F.col("linear_units") / F.lit(1_000_000.0)).alias("linear_credit"),
    )


def attribution_oracle(
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`attribution` — the same pair predicate as
    a plain range join (DuckDB's optimizer handles it at oracle scale),
    the same composite ordering key via HUGEINT arg_min/arg_max, the
    same micro-credit rounding."""
    touch_list = ", ".join(f"'{t}'" for t in touch_types)
    lb_us = lookback_seconds * 1_000_000
    return f"""
        WITH convs AS (
            SELECT {key} AS k, epoch_us({ts_col}) AS cts,
                   {tie_col} AS conv_id
            FROM {table} WHERE {type_col} = '{conversion_type}'
        ),
        touches AS (
            SELECT {key} AS k, epoch_us({ts_col}) AS tts,
                   {type_col} AS touch, {tie_col} AS touch_id
            FROM {table} WHERE {type_col} IN ({touch_list})
        ),
        pairs AS (
            SELECT c.conv_id, t.touch,
                   CAST(t.tts AS HUGEINT) * {_KEY_BASE} + t.touch_id
                       AS ordkey
            FROM convs c JOIN touches t
              ON c.k = t.k
             AND t.tts < c.cts AND t.tts >= c.cts - {lb_us}
        ),
        per_conv AS (
            SELECT conv_id, COUNT(*) AS n,
                   arg_min(touch, ordkey) AS ft,
                   arg_max(touch, ordkey) AS lt
            FROM pairs GROUP BY conv_id
        ),
        per_conv_type AS (
            SELECT p.conv_id, p.touch, COUNT(*) AS cnt,
                   ANY_VALUE(c.n) AS n, ANY_VALUE(c.ft) AS ft,
                   ANY_VALUE(c.lt) AS lt
            FROM pairs p JOIN per_conv c USING (conv_id)
            GROUP BY p.conv_id, p.touch
        ),
        attributed AS (
            SELECT touch AS touch_type,
                   COUNT(CASE WHEN ft = touch THEN 1 END) AS first_touch,
                   COUNT(CASE WHEN lt = touch THEN 1 END) AS last_touch,
                   CAST(SUM(CAST(ROUND(1000000 * cnt / CAST(n AS DOUBLE))
                                 AS BIGINT)) AS BIGINT) AS linear_units
            FROM per_conv_type GROUP BY touch
        ),
        unattributed AS (
            SELECT CAST(NULL AS VARCHAR) AS touch_type,
                   COUNT(*) AS first_touch, COUNT(*) AS last_touch,
                   CAST(0 AS BIGINT) AS linear_units
            FROM convs
            WHERE conv_id NOT IN (SELECT conv_id FROM pairs)
            HAVING COUNT(*) > 0
        )
        SELECT touch_type, first_touch, last_touch, linear_units,
               linear_units / 1000000.0 AS linear_credit
        FROM (SELECT * FROM attributed
              UNION ALL SELECT * FROM unattributed)
    """
