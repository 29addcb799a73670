"""Cohort retention analysis — the classic engagement rollup the
reference's dashboard story implies but never computes: group users by
the period of their FIRST event (their cohort), then measure what
fraction of each cohort is still active N periods later.

Reference tie-in: the serving tables answer "latest events per device"
and "hourly aggregates per device" (init.cql:19-54); the fleet-level
question behind both — are devices/users still reporting over time? —
is exactly a retention matrix over the same event stream.

Plan shape (pure Catalyst, no UDFs): one scan feeds both the
per-user cohort (groupBy user, MIN period) and the distinct
(user, period) activity set; they join on the user key — both sides
arrive clustered by that key, so no third shuffle materializes — and
the matrix aggregation is a partial-aggregable groupBy over
(cohort, offset). The final retention rate divides each cell by its
cohort's offset-0 population through one window over the (tiny)
matrix. Period indices are integer-exact floor alignment
(``us - pmod(us, period_us)``, the gapfill r7 rule), so pre-1970
timestamps and every engine agree.

100 TB: the wide work is two user-keyed aggregations over the raw
events and a matrix groupBy whose cardinality is cohorts x offsets —
thousands of rows however large the corpus; the rate window runs over
that matrix, not the events.
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
    us = F.unix_micros(F.col(ts_col))
    p_us = F.lit(period_seconds * 1_000_000)
    # integer-exact floor alignment; the division back to an index is
    # exact (aligned is a multiple of the period)
    idx = ((us - F.pmod(us, p_us)) / p_us).cast("long")
    pts = events.select(F.col(key).alias("k"), idx.alias("pi"))
    cohorts = pts.groupBy("k").agg(F.min("pi").alias("cohort_idx"))
    active = pts.distinct()
    matrix = (
        active.join(cohorts, "k")
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
