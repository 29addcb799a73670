"""Cohort retention analysis — the classic engagement rollup the
reference's dashboard story implies but never computes: group users by
the period of their FIRST event (their cohort), then measure what
fraction of each cohort is still active N periods later.

Reference tie-in: the serving tables answer "latest events per device"
and "hourly aggregates per device" (init.cql:19-54); the fleet-level
question behind both — are devices/users still reporting over time? —
is exactly a retention matrix over the same event stream.

Plan shape (pure Catalyst, no UDFs, ONE events-wide exchange): a
single user-keyed aggregation computes each user's cohort (MIN of
their period indices) and their distinct period set (collect_set —
bounded by the corpus's period count, weeks-since-launch, never by
the event volume) in the same pass; exploding the set and
subtracting the cohort gives the (cohort, offset) matrix through a
partial-aggregable groupBy whose exchange carries per-user DISTINCT
period rows, not events. No join anywhere (the r7 plan joined a
distinct (user, period) set back to the cohorts and re-exchanged it
by user — an avoidable second events-derived shuffle). The final
retention rate divides each cell by its cohort's offset-0 population
through one window over the (tiny) matrix. Period indices are
integer-exact floor alignment + integer division
(``(us - pmod(us, p)) div p``, the gapfill r7 rule — exact for ALL
timestamps, matching the oracle's ``//`` with no 2^53 double limit),
so pre-1970 and far-future timestamps agree across engines.

100 TB: the wide work is one user-keyed aggregation over the raw
events; everything after runs over per-user period sets (matrix-
bounded) and the matrix itself — thousands of rows however large the
corpus; the rate window runs over that matrix, not the events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default period: one week (epoch-aligned weeks — deterministic,
#: engine-independent; calendar-aligned weeks would drag in timezone
#: and locale, which the oracle contract deliberately avoids)
WEEK_SECONDS = 7 * 86_400


def retention_matrix(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = WEEK_SECONDS,
) -> DataFrame:
    """(cohort_idx, offset_periods, n_users, cohort_size, retention):
    for each cohort (period index of a user's first event) and offset
    (periods since the cohort period), the count of distinct users
    active then, the cohort's own size (= its offset-0 count: every
    member is active in its first period by definition), and the
    retained fraction (one IEEE division per matrix cell, mirrored by
    the oracle). Offset 0 rows carry retention 1.0 exactly."""
    return retention_matrix_from_pts(
        period_points(events, key, ts_col, period_seconds)
    )


def period_points(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = WEEK_SECONDS,
) -> DataFrame:
    """(k, pi): each event's key and integer period index — the
    stateless projection both the batch matrix and the streaming
    cohort store (streaming/cohorts.py) build on. Integer-exact floor
    alignment AND integer division back to the index (``div``, not
    ``/``: the double round-trip is only exact below 2^53 — r7
    ADVICE; the oracle's ``//`` is integer-exact, so Spark must be
    too)."""
    us = F.unix_micros(F.col(ts_col))
    p = int(period_seconds) * 1_000_000
    return events.select(
        F.col(key).alias("k"), us.alias("_us")
    ).select("k", F.expr(f"(_us - pmod(_us, {p})) div {p}").alias("pi"))


def retention_matrix_from_pts(pts: DataFrame) -> DataFrame:
    """The matrix aggregation over (k, pi) period points — see
    :func:`retention_matrix` for semantics and the plan contract.
    Duplicate (k, pi) rows are fine (collect_set dedups), so callers
    can feed raw per-event points or a pre-distincted store."""
    per_user = pts.groupBy("k").agg(
        F.min("pi").alias("cohort_idx"),
        F.collect_set("pi").alias("pis"),
    )
    matrix = (
        per_user.select("cohort_idx", F.explode("pis").alias("pi"))
        .groupBy(
            "cohort_idx",
            (F.col("pi") - F.col("cohort_idx")).alias("offset_periods"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("cohort_idx")
    size = F.max(
        F.when(F.col("offset_periods") == 0, F.col("n_users"))
    ).over(w)
    return matrix.select(
        "cohort_idx",
        "offset_periods",
        "n_users",
        size.alias("cohort_size"),
        (F.col("n_users").cast("double") / size).alias("retention"),
    )


def retention_matrix_oracle(
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = WEEK_SECONDS,
) -> str:
    """DuckDB twin of :func:`retention_matrix` — identical floor
    alignment (double-mod non-negative remainder), identical distinct
    semantics, identical single division per cell."""
    p = period_seconds * 1_000_000
    return f"""
        WITH pts AS (
            SELECT {key} AS k,
                   (epoch_us({ts_col})
                    - ((epoch_us({ts_col}) % {p}) + {p}) % {p}) // {p}
                       AS pi
            FROM {table}
        ),
        cohorts AS (
            SELECT k, MIN(pi) AS cohort_idx FROM pts GROUP BY k
        ),
        active AS (SELECT DISTINCT k, pi FROM pts),
        matrix AS (
            SELECT cohort_idx,
                   pi - cohort_idx AS offset_periods,
                   COUNT(*) AS n_users
            FROM active JOIN cohorts USING (k)
            GROUP BY cohort_idx, pi - cohort_idx
        )
        SELECT cohort_idx, offset_periods, n_users,
               MAX(CASE WHEN offset_periods = 0 THEN n_users END)
                   OVER (PARTITION BY cohort_idx) AS cohort_size,
               CAST(n_users AS DOUBLE)
                   / MAX(CASE WHEN offset_periods = 0 THEN n_users END)
                     OVER (PARTITION BY cohort_idx) AS retention
        FROM matrix
    """


def rolling_active(
    events: DataFrame,
    window_periods: int = 7,
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86_400,
) -> DataFrame:
    """(pi, period_start_us, n_active): rolling distinct-active count
    — for each observed period index ``pi``, how many distinct keys
    were active in the trailing ``window_periods`` periods ending at
    ``pi`` (window_periods=7 over daily periods = WAU; 28 = MAU; 1 =
    plain DAU). Reported for every period in the observed [min, max]
    span, including gaps (a period with no events still has trailing
    actives).

    Plan shape (pure Catalyst, exact): the distinct (key, period)
    point set — the SAME sufficient statistic the retention matrix
    and its streaming store use — explodes each point onto the
    ``window_periods`` window-ends it supports (a bounded sequence,
    so the blow-up is w x distinct user-periods, NOT w x events),
    dedups (a user active twice inside one window counts once), and
    counts per end. The span bounds come from one 2-scalar aggregate
    (the documented bounded-collect class).

    100 TB: the events-wide work is the ONE distinct over (key, pi) —
    everything after is user-period-bounded x window length. For MAU
    over years of data this is the textbook exact plan; swap the
    final count for approx_count_distinct only if the distinct
    (k, pe) exchange itself becomes the bottleneck."""
    return rolling_active_from_pts(
        period_points(events, key, ts_col, period_seconds),
        window_periods,
        period_seconds,
    )


def rolling_active_from_pts(
    pts: DataFrame,
    window_periods: int = 7,
    period_seconds: int = 86_400,
) -> DataFrame:
    """The rolling-actives aggregation over (k, pi) period points —
    see :func:`rolling_active`. Duplicate points are fine (the
    expansion dedups), so callers can feed raw projections or the
    streaming cohort store (streaming/cohorts.py)."""
    if window_periods < 1:
        raise ValueError("need window_periods >= 1")
    pts = pts.distinct()
    bounds = pts.agg(
        F.min("pi").alias("lo"), F.max("pi").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return pts.sparkSession.createDataFrame(
            [], "pi BIGINT, period_start_us BIGINT, n_active BIGINT"
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    p_us = int(period_seconds) * 1_000_000
    contrib = pts.select(
        "k",
        F.explode(
            F.sequence(F.col("pi"), F.col("pi") + (window_periods - 1))
        ).alias("pe"),
    ).filter((F.col("pe") >= lo) & (F.col("pe") <= hi))
    return (
        contrib.distinct()
        .groupBy("pe")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.col("pe").alias("pi"),
            (F.col("pe") * p_us).alias("period_start_us"),
            "n_active",
        )
    )


def rolling_active_oracle(
    window_periods: int = 7,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86_400,
) -> str:
    """DuckDB twin of :func:`rolling_active`: identical period
    alignment, identical window-end expansion, COUNT(DISTINCT)."""
    p = period_seconds * 1_000_000
    return f"""
        WITH pts AS (
            SELECT DISTINCT {key} AS k,
                   (epoch_us({ts_col})
                    - ((epoch_us({ts_col}) % {p}) + {p}) % {p}) // {p}
                       AS pi
            FROM {table}
        ),
        bounds AS (SELECT MIN(pi) AS lo, MAX(pi) AS hi FROM pts),
        contrib AS (
            SELECT k, t.pe
            FROM pts,
                 UNNEST(generate_series(pi, pi + {window_periods - 1}))
                     AS t(pe)
            WHERE t.pe BETWEEN (SELECT lo FROM bounds)
                           AND (SELECT hi FROM bounds)
        )
        SELECT pe AS pi, pe * {p} AS period_start_us,
               COUNT(DISTINCT k) AS n_active
        FROM contrib
        GROUP BY pe
    """


def growth_accounting(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86_400,
) -> DataFrame:
    """(pi, n_active, n_new, n_retained, n_resurrected, n_churned):
    the standard growth-accounting decomposition per period — every
    active key is NEW (first-ever period), RETAINED (also active the
    previous period) or RESURRECTED (active before, but not the
    previous period); CHURNED counts keys active the previous period
    but not this one. Identities (pinned in tests):
    ``n_active = n_new + n_retained + n_resurrected`` and
    ``n_churned(pi) = n_active(pi-1) - n_retained(pi)``. Churn rows
    appear for every period in (lo, hi] even when nobody was active
    in it; periods outside the observed span are not reported.

    Plan shape: the distinct (key, period) point set (the shared
    sufficient statistic of this module), ONE user-keyed window
    computing first/lag/lead per point, then two period-keyed
    partial-aggregable counts unioned into the report — the
    events-wide work is the one distinct; everything after is
    user-period-bounded.

    100 TB: same posture as retention_matrix — the wide exchange
    carries distinct user-periods, never events."""
    return growth_accounting_from_pts(
        period_points(events, key, ts_col, period_seconds)
    )


def growth_accounting_from_pts(pts: DataFrame) -> DataFrame:
    """The growth decomposition over (k, pi) period points — see
    :func:`growth_accounting`. Duplicate points are fine (the first
    step is a distinct), so callers can feed raw projections or the
    streaming cohort store."""
    pts = pts.distinct()
    w = Window.partitionBy("k").orderBy("pi")
    flagged = pts.select(
        "k",
        "pi",
        (F.col("pi") == F.min("pi").over(w)).alias("is_new"),
        (F.lag("pi").over(w) == F.col("pi") - 1).alias("is_retained"),
        F.lead("pi").over(w).alias("next_pi"),
    )
    per_period = flagged.groupBy("pi").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("n_new"),
        F.sum(
            F.when(F.coalesce(F.col("is_retained"), F.lit(False)), 1)
            .otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                ~F.col("is_new")
                & ~F.coalesce(F.col("is_retained"), F.lit(False)),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    hi_row = pts.agg(F.max("pi").alias("hi")).collect()[0]
    if hi_row["hi"] is None:
        return pts.sparkSession.createDataFrame(
            [],
            "pi BIGINT, n_active BIGINT, n_new BIGINT, n_retained"
            " BIGINT, n_resurrected BIGINT, n_churned BIGINT",
        )
    hi = int(hi_row["hi"])
    churn = (
        flagged.filter(
            (
                F.col("next_pi").isNull()
                | (F.col("next_pi") > F.col("pi") + 1)
            )
            & (F.col("pi") < hi)
        )
        .groupBy((F.col("pi") + 1).alias("pi"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        per_period.join(churn, "pi", "full")
        .select(
            "pi",
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


def growth_accounting_oracle(
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86_400,
) -> str:
    """DuckDB twin of :func:`growth_accounting`: identical point set,
    identical window flags, identical churn attribution."""
    p = period_seconds * 1_000_000
    return f"""
        WITH pts AS (
            SELECT DISTINCT {key} AS k,
                   (epoch_us({ts_col})
                    - ((epoch_us({ts_col}) % {p}) + {p}) % {p}) // {p}
                       AS pi
            FROM {table}
        ),
        flagged AS (
            SELECT k, pi,
                   pi = MIN(pi) OVER (PARTITION BY k) AS is_new,
                   LAG(pi) OVER (PARTITION BY k ORDER BY pi) = pi - 1
                       AS is_retained,
                   LEAD(pi) OVER (PARTITION BY k ORDER BY pi)
                       AS next_pi
            FROM pts
        ),
        per_period AS (
            SELECT pi,
                   COUNT(*) AS n_active,
                   SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS n_new,
                   SUM(CASE WHEN COALESCE(is_retained, FALSE)
                            THEN 1 ELSE 0 END) AS n_retained,
                   SUM(CASE WHEN NOT is_new
                                 AND NOT COALESCE(is_retained, FALSE)
                            THEN 1 ELSE 0 END) AS n_resurrected
            FROM flagged GROUP BY pi
        ),
        churn AS (
            SELECT pi + 1 AS pi, COUNT(*) AS n_churned
            FROM flagged
            WHERE (next_pi IS NULL OR next_pi > pi + 1)
              AND pi < (SELECT MAX(pi) FROM pts)
            GROUP BY pi + 1
        )
        SELECT COALESCE(per_period.pi, churn.pi) AS pi,
               CAST(COALESCE(n_active, 0) AS BIGINT) AS n_active,
               CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
               CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
               CAST(COALESCE(n_resurrected, 0) AS BIGINT)
                   AS n_resurrected,
               CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned
        FROM per_period FULL JOIN churn
          ON per_period.pi = churn.pi
    """


def retention_matrix_segmented(
    events: DataFrame,
    segments: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    segment_col: str = "segment",
    period_seconds: int = WEEK_SECONDS,
) -> DataFrame:
    """Per-segment retention matrices in ONE pass — the cohort sibling
    of ``funnel_segmented``: each user's matrix contribution lands
    under their segment from a user-keyed dimension (acquisition
    channel, plan tier, region). Output adds ``segment`` ahead of the
    matrix columns; users absent from the dimension report under a
    NULL segment (LEFT join — dropping them silently would make the
    per-segment matrices not sum to the global one).

    Plan: the dimension joins BROADCAST onto the per-user fold result
    (one row per user — the funnel_segmented discipline: enrich AFTER
    the heavy aggregation, never the event stream), so the events-wide
    work is identical to the unsegmented matrix; the matrix
    aggregation and cohort-size window just gain the segment key."""
    pts = period_points(events, key, ts_col, period_seconds)
    per_user = pts.groupBy("k").agg(
        F.min("pi").alias("cohort_idx"),
        F.collect_set("pi").alias("pis"),
    )
    dim = F.broadcast(
        segments.select(
            F.col(key).alias("k"), F.col(segment_col).alias("segment")
        )
    )
    matrix = (
        per_user.join(dim, "k", "left")
        .select("segment", "cohort_idx", F.explode("pis").alias("pi"))
        .groupBy(
            "segment",
            "cohort_idx",
            (F.col("pi") - F.col("cohort_idx")).alias("offset_periods"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("segment", "cohort_idx")
    size = F.max(
        F.when(F.col("offset_periods") == 0, F.col("n_users"))
    ).over(w)
    return matrix.select(
        "segment",
        "cohort_idx",
        "offset_periods",
        "n_users",
        size.alias("cohort_size"),
        (F.col("n_users").cast("double") / size).alias("retention"),
    )


def retention_matrix_segmented_oracle(
    table: str = "events",
    segments_sql: str = "SELECT user_id, segment FROM segments",
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = WEEK_SECONDS,
) -> str:
    """DuckDB twin of :func:`retention_matrix_segmented`."""
    p = period_seconds * 1_000_000
    return f"""
        WITH pts AS (
            SELECT {key} AS k,
                   (epoch_us({ts_col})
                    - ((epoch_us({ts_col}) % {p}) + {p}) % {p}) // {p}
                       AS pi
            FROM {table}
        ),
        per_user AS (
            SELECT k, MIN(pi) AS cohort_idx FROM pts GROUP BY k
        ),
        active AS (SELECT DISTINCT k, pi FROM pts),
        dim AS (SELECT {key} AS k, segment FROM ({segments_sql})),
        matrix AS (
            SELECT dim.segment, cohort_idx,
                   pi - cohort_idx AS offset_periods,
                   COUNT(*) AS n_users
            FROM active
            JOIN per_user USING (k)
            LEFT JOIN dim USING (k)
            GROUP BY dim.segment, cohort_idx, pi - cohort_idx
        )
        SELECT segment, cohort_idx, offset_periods, n_users,
               MAX(CASE WHEN offset_periods = 0 THEN n_users END)
                   OVER (PARTITION BY segment, cohort_idx) AS cohort_size,
               CAST(n_users AS DOUBLE)
                   / MAX(CASE WHEN offset_periods = 0 THEN n_users END)
                     OVER (PARTITION BY segment, cohort_idx) AS retention
        FROM matrix
    """
