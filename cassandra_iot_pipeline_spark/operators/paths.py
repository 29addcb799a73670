"""Event-transition (path) analysis — the first-order Markov view of
the event stream: for each ordered pair of event types, how often
does one follow the other within a user's timeline, and with what
probability.

Reference tie-in: the funnel (operators/funnel.py) asks about ONE
prescribed order; the transition matrix is its exploratory
complement — it tells you WHICH funnels exist in the data (the
highest-probability edges are the paths worth defining funnels for).

Semantics: per key, order events by the TOTAL order (ts, tie_col) —
microsecond timestamps with an id tiebreak, so the successor
relation is deterministic in both engines. Each consecutive pair
contributes one (src, dst) transition; the first event of a key has
no predecessor and contributes nothing. ``prob`` is the row-
stochastic rate n / out_total — exact BIGINT counts, one IEEE
division (the exactmath discipline).

Plan shape (pure Catalyst): one events-wide exchange for the per-key
ordering window (lag), then a partial-aggregable groupBy whose
exchange carries at most |event types|^2 rows per task, then a
window over the matrix itself for the row totals. At 100 TB the only
data-wide cost is the per-key sort-window — the same shape as
sessionization, and like it the right physical layout (events
bucketed by key, sorted by ts at rest; storage.py) removes the
exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """(src, dst, n, out_total, prob): the per-key successor counts
    and row-stochastic transition rates."""
    w = Window.partitionBy(key).orderBy(
        F.unix_micros(F.col(ts_col)), F.col(tie_col)
    )
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("src"),
            F.col(type_col).alias("dst"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_src = Window.partitionBy("src")
    out_total = F.sum("n").over(w_src)
    return pairs.select(
        "src",
        "dst",
        "n",
        out_total.alias("out_total"),
        (F.col("n").cast("double") / out_total).alias("prob"),
    )


def event_transitions_oracle(
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> str:
    """DuckDB twin: identical total order, identical counts, one
    division per matrix cell."""
    return f"""
        WITH pairs AS (
            SELECT LAG({type_col}) OVER (
                       PARTITION BY {key}
                       ORDER BY epoch_us({ts_col}), {tie_col}
                   ) AS src,
                   {type_col} AS dst
            FROM {table}
        ),
        matrix AS (
            SELECT src, dst, COUNT(*) AS n
            FROM pairs WHERE src IS NOT NULL
            GROUP BY src, dst
        )
        SELECT src, dst, n,
               -- DuckDB SUM(BIGINT) is HUGEINT (pandas float64): cast
               -- back so the dtype matches Spark's BIGINT sum
               CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT)
                   AS out_total,
               CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT)
                   AS prob
        FROM matrix
    """
