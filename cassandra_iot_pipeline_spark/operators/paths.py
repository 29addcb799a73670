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

HOT-KEY BOUND (the funnel/mad_outliers class, stated once for both
operators here): the per-key ordering window lands ALL of a key's
events in one task. Unlike funnel's in-memory collect_list buffer,
a window sort SPILLS (UnsafeExternalSorter), so a bot key degrades
to one slow task rather than an OOM — but it still serializes that
key's timeline; cap such keys upstream with
``functions.cleaning.cap_events_per_key`` (deterministic
keep-earliest-N; measured context: SCALE.md's skewed-funnel probe
rows, capped vs uncapped).
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


def top_paths(
    events: DataFrame,
    length: int = 3,
    k: int = 20,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """(path, n): the k most frequent length-``length`` consecutive
    event-type sequences across all keys (sliding window, so a
    timeline of m events contributes m - length + 1 paths). Ties on n
    order by path string for a deterministic top-k. ``path`` joins
    types with '>' — e.g. ``view>click>purchase``.

    Plan: the same one events-wide ordering exchange as
    :func:`event_transitions` with ``length - 1`` lead() columns over
    it (one window stage, shared sort), then a partial-aggregable
    count whose exchange is bounded by |types|^length."""
    if length < 2:
        raise ValueError("a path needs length >= 2")
    w = Window.partitionBy(key).orderBy(
        F.unix_micros(F.col(ts_col)), F.col(tie_col)
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, length)
    ]
    return (
        events.select(
            F.concat_ws(">", *steps).alias("path"),
            steps[-1].isNotNull().alias("_full"),
        )
        .filter(F.col("_full"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(k)
    )


def top_paths_oracle(
    length: int = 3,
    k: int = 20,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> str:
    leads = ", ".join(
        f"LEAD({type_col}, {i}) OVER (PARTITION BY {key} "
        f"ORDER BY epoch_us({ts_col}), {tie_col}) AS s{i}"
        for i in range(1, length)
    )
    concat = " || '>' || ".join([type_col] + [f"s{i}" for i in range(1, length)])
    return f"""
        WITH seq AS (
            SELECT {type_col}, {leads} FROM {table}
        )
        SELECT {concat} AS path, COUNT(*) AS n
        FROM seq
        WHERE s{length - 1} IS NOT NULL
        GROUP BY path
        ORDER BY n DESC, path
        LIMIT {k}
    """


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
