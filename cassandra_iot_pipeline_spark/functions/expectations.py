"""Declarative data-quality expectations — the contract-audit pass a
training-data pipeline runs before trusting a new drop of data
(completeness, uniqueness, ranges, accepted values, regex shape,
row-count envelope), in the style of Deequ/Great Expectations but
compiled to ONE Spark aggregation.

Reference tie-in: the reference trusts its Avro schema registry to
gate event SHAPE (spark_consumer.py's from_avro contract) but has no
VALUE gate — a sensor stuck at null or a device id colliding across
tenants sails through. This module is that missing gate, generalized
to any frame.

Plan shape: every requested metric becomes a conditional-count /
count-distinct expression inside a single ``df.agg(...)`` — one scan,
map-side partial aggregation, a 1-row result. The k-row report frame
is then built by exploding an array of struct literals over that
1-row frame: no second pass, no collect. Uniqueness uses EXACT
``count_distinct`` (Catalyst compiles multiple distincts via Expand —
still one scan, rows multiplied by the number of distinct columns;
swap to ``approx=True`` per check for HLL at 100 TB where an exact
distinct would dominate the audit).

Exactness contract: every metric is a ratio of exact BIGINT counts
with ONE IEEE division (the repo's exactmath discipline), so the
DuckDB oracle matches bitwise. Value-fraction checks (range /
accepted / regex) measure over NON-NULL values only — pair them with
a completeness check to catch null floods; an all-null column yields
metric NULL / passed NULL.

Regex portability: Spark ``rlike`` is java.util.regex, DuckDB
``regexp_matches`` is RE2 — both unanchored partial match. Stick to
the shared subset (no lookbehind, no possessive quantifiers) for
oracle-checked patterns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Completeness:
    """Fraction of rows with ``column`` non-null >= min_frac."""

    column: str
    min_frac: float = 1.0


@dataclass(frozen=True)
class Uniqueness:
    """Distinct non-null values / non-null rows >= min_frac (1.0
    means: no duplicated value; a primary-key check)."""

    column: str
    min_frac: float = 1.0
    approx: bool = False


@dataclass(frozen=True)
class InRange:
    """Fraction of NON-NULL values inside [lo, hi] >= min_frac."""

    column: str
    lo: float
    hi: float
    min_frac: float = 1.0


@dataclass(frozen=True)
class AcceptedValues:
    """Fraction of NON-NULL values in ``values`` >= min_frac."""

    column: str
    values: tuple[str, ...]
    min_frac: float = 1.0


@dataclass(frozen=True)
class MatchesRegex:
    """Fraction of NON-NULL values matching ``pattern`` (unanchored
    partial match in both engines) >= min_frac."""

    column: str
    pattern: str
    min_frac: float = 1.0


@dataclass(frozen=True)
class RowCount:
    """lo <= row count (<= hi when given)."""

    lo: int
    hi: int | None = None


Check = (
    Completeness | Uniqueness | InRange | AcceptedValues | MatchesRegex | RowCount
)


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _metric_plan(check: Check, i: int):
    """(label, target, agg_columns, metric_from_row, threshold).

    ``agg_columns`` go into the single agg; ``metric_from_row`` is a
    (spark_expr_builder, duckdb_sql) pair over the aliased metric
    columns. Numerators/denominators are exact counts; the metric is
    one division."""
    n = f"_m{i}"
    if isinstance(check, Completeness):
        aggs = [
            F.count(F.col(check.column)).alias(f"{n}_num"),
            F.count(F.lit(1)).alias(f"{n}_den"),
        ]
        sql_aggs = [
            f"COUNT({check.column}) AS {n}_num",
            f"COUNT(*) AS {n}_den",
        ]
        return (
            f"completeness({check.column})", check.column,
            aggs, sql_aggs, check.min_frac,
        )
    if isinstance(check, Uniqueness):
        distinct = (
            F.approx_count_distinct(check.column)
            if check.approx
            else F.count_distinct(F.col(check.column))
        )
        sql_distinct = (
            f"approx_count_distinct({check.column})"
            if check.approx
            else f"COUNT(DISTINCT {check.column})"
        )
        aggs = [
            distinct.alias(f"{n}_num"),
            F.count(F.col(check.column)).alias(f"{n}_den"),
        ]
        sql_aggs = [
            f"{sql_distinct} AS {n}_num",
            f"COUNT({check.column}) AS {n}_den",
        ]
        return (
            f"uniqueness({check.column})", check.column,
            aggs, sql_aggs, check.min_frac,
        )
    if isinstance(check, InRange):
        cond = F.col(check.column).between(
            F.lit(check.lo), F.lit(check.hi)
        )
        aggs = [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"{n}_num"),
            F.count(F.col(check.column)).alias(f"{n}_den"),
        ]
        sql_aggs = [
            f"SUM(CASE WHEN {check.column} BETWEEN {check.lo} AND"
            f" {check.hi} THEN 1 ELSE 0 END) AS {n}_num",
            f"COUNT({check.column}) AS {n}_den",
        ]
        return (
            f"in_range({check.column}, {check.lo}, {check.hi})",
            check.column, aggs, sql_aggs, check.min_frac,
        )
    if isinstance(check, AcceptedValues):
        cond = F.col(check.column).isin(list(check.values))
        vals = ", ".join(_sql_str(v) for v in check.values)
        aggs = [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"{n}_num"),
            F.count(F.col(check.column)).alias(f"{n}_den"),
        ]
        sql_aggs = [
            f"SUM(CASE WHEN {check.column} IN ({vals}) THEN 1 ELSE 0"
            f" END) AS {n}_num",
            f"COUNT({check.column}) AS {n}_den",
        ]
        return (
            f"accepted_values({check.column})", check.column,
            aggs, sql_aggs, check.min_frac,
        )
    if isinstance(check, MatchesRegex):
        cond = F.col(check.column).rlike(check.pattern)
        aggs = [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"{n}_num"),
            F.count(F.col(check.column)).alias(f"{n}_den"),
        ]
        sql_aggs = [
            f"SUM(CASE WHEN regexp_matches({check.column},"
            f" {_sql_str(check.pattern)}) THEN 1 ELSE 0 END)"
            f" AS {n}_num",
            f"COUNT({check.column}) AS {n}_den",
        ]
        return (
            f"matches_regex({check.column})", check.column,
            aggs, sql_aggs, check.min_frac,
        )
    if isinstance(check, RowCount):
        aggs = [F.count(F.lit(1)).alias(f"{n}_num")]
        sql_aggs = [f"COUNT(*) AS {n}_num"]
        label = (
            f"row_count(>={check.lo})"
            if check.hi is None
            else f"row_count({check.lo}..{check.hi})"
        )
        return (label, None, aggs, sql_aggs, float(check.lo))
    raise TypeError(f"unknown check {check!r}")


def expectations_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(check_name, target, metric, threshold, passed): one row per
    check, computed in a single aggregation pass over ``df``."""
    if not checks:
        raise ValueError("need at least one check")
    agg_cols: list[Column] = []
    entries: list[Column] = []
    for i, check in enumerate(checks):
        label, target, aggs, _, thr = _metric_plan(check, i)
        agg_cols.extend(aggs)
        n = f"_m{i}"
        if isinstance(check, RowCount):
            metric = F.col(f"{n}_num").cast("double")
            passed = (F.col(f"{n}_num") >= check.lo) & (
                F.lit(True)
                if check.hi is None
                else (F.col(f"{n}_num") <= check.hi)
            )
        else:
            metric = F.when(
                F.col(f"{n}_den") > 0,
                F.col(f"{n}_num").cast("double") / F.col(f"{n}_den"),
            )
            passed = F.when(
                F.col(f"{n}_den") > 0, metric >= F.lit(thr)
            )
        entries.append(
            F.struct(
                F.lit(label).alias("check_name"),
                F.lit(target).cast("string").alias("target"),
                metric.alias("metric"),
                F.lit(float(thr)).alias("threshold"),
                passed.alias("passed"),
            )
        )
    metrics = df.agg(*agg_cols)
    return metrics.select(
        F.explode(F.array(*entries)).alias("e")
    ).select("e.*")


def expectations_oracle(checks: list[Check], table: str = "events") -> str:
    """DuckDB twin of :func:`expectations_report`: same single metric
    CTE, same one-division metrics, same NULL contract."""
    sql_aggs: list[str] = []
    selects: list[str] = []
    for check in checks:
        if isinstance(check, Uniqueness) and check.approx:
            raise ValueError(
                "approx uniqueness has no cross-engine oracle (Spark "
                "HLL++ and DuckDB HLL disagree by design); verify "
                "approx checks against the exact form's bounds instead"
            )
    for i, check in enumerate(checks):
        label, target, _, aggs_sql, thr = _metric_plan(check, i)
        sql_aggs.extend(aggs_sql)
        n = f"_m{i}"
        target_sql = "CAST(NULL AS VARCHAR)" if target is None else _sql_str(target)
        if isinstance(check, RowCount):
            hi = "TRUE" if check.hi is None else f"{n}_num <= {check.hi}"
            metric = f"CAST({n}_num AS DOUBLE)"
            passed = f"({n}_num >= {check.lo} AND {hi})"
        else:
            metric = (
                f"CASE WHEN {n}_den > 0 THEN CAST({n}_num AS DOUBLE)"
                f" / {n}_den END"
            )
            passed = (
                f"CASE WHEN {n}_den > 0 THEN CAST({n}_num AS DOUBLE)"
                f" / {n}_den >= {thr} END"
            )
        selects.append(
            f"SELECT {_sql_str(label)} AS check_name,"
            f" {target_sql} AS target, {metric} AS metric,"
            f" CAST({thr} AS DOUBLE) AS threshold,"
            f" {passed} AS passed FROM m"
        )
    return (
        f"WITH m AS (SELECT {', '.join(sql_aggs)} FROM {table}) "
        + "\nUNION ALL ".join(selects)
    )


#: The events-table contract a reference deployment would audit: ids
#: present and unique, event types from the known set, sane values.
EVENTS_CHECKS: list[Check] = [
    Completeness("event_id"),
    Completeness("user_id"),
    Uniqueness("event_id"),
    AcceptedValues(
        "event_type", ("view", "click", "purchase", "signup", "error")
    ),
    InRange("value", 0.0, 1e6, min_frac=0.99),
    RowCount(1),
]


def events_expectations(df: DataFrame) -> DataFrame:
    return expectations_report(df, EVENTS_CHECKS)


def events_expectations_oracle(table: str = "events") -> str:
    return expectations_oracle(EVENTS_CHECKS, table)
