"""Robust seasonal outlier detection (operators/stats.py::
mad_outliers): hand-computed median/MAD flagging, the contaminated-
baseline property that motivates MAD over stddev, degenerate-MAD
behavior, DuckDB windowed-quantile parity on the fixture, and the
one-exchange/no-join plan pin."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.stats import (
    mad_outliers,
    mad_outliers_oracle,
)
from tests.conftest import SF_DIR
from tools.oracle_check import compare


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )


def _at(day: int, hour: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1 + day, hour, minute)


def test_hand_computed_flagging(spark):
    # user 1, hour 9 across days: baseline ~20, one wild 90
    rows = [(1, _at(d, 9), v) for d, v in enumerate([20.0, 21.0, 19.0, 20.5, 90.0])]
    # units: 2000 2100 1900 2050 9000 -> med 2050; |dev| 50 50 150 0 6950
    # MAD = med(0,50,50,150,6950) = 50; k=3.5 -> cut 175: only 9000 out
    got = mad_outliers(_frame(spark, rows)).collect()
    assert [(r["value"], r["season_median"], r["season_mad"]) for r in got] == [
        (90.0, 20.5, 0.5)
    ]
    allr = mad_outliers(_frame(spark, rows), outliers_only=False)
    assert allr.count() == 5
    assert allr.filter(F.col("is_outlier")).count() == 1


def test_hours_are_separate_baselines(spark):
    # the same value is normal at hour 9 (high baseline) and an
    # outlier at hour 3 (low baseline)
    rows = [(1, _at(d, 9), 80.0 + d) for d in range(5)]
    rows += [(1, _at(d, 3), 5.0 + 0.1 * d) for d in range(5)]
    rows += [(1, _at(5, 3), 82.0)]  # hour-3 sample at the hour-9 level
    got = mad_outliers(_frame(spark, rows)).collect()
    assert [(r["hod"], r["value"]) for r in got] == [(3, 82.0)]


def test_mad_survives_contamination_where_stddev_drowns(spark):
    # two gross outliers inflate stddev enough that a 3-sigma rule
    # misses them both; MAD still flags them
    vals = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.3, 9.7, 500.0, 480.0]
    rows = [(1, _at(d, 12), v) for d, v in enumerate(vals)]
    got = mad_outliers(_frame(spark, rows)).collect()
    assert sorted(r["value"] for r in got) == [480.0, 500.0]
    import statistics

    mu, sd = statistics.mean(vals), statistics.pstdev(vals)
    assert abs(500.0 - mu) < 3 * sd  # the classical rule misses it


def test_degenerate_mad_flags_any_deviation(spark):
    rows = [(1, _at(d, 6), 7.0) for d in range(6)] + [(1, _at(6, 6), 7.01)]
    got = mad_outliers(_frame(spark, rows)).collect()
    assert [(r["value"], r["season_mad"]) for r in got] == [(7.01, 0.0)]


def test_fixture_duckdb_parity(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    for only in (True, False):
        got = mad_outliers(events, outliers_only=only).toPandas()
        want = duck.sql(mad_outliers_oracle(outliers_only=only)).df()
        assert compare(got, want) == [], only
    assert len(got) >= 900  # the full frame (1000 events, nulls off)


def test_one_exchange_no_join_plan(spark):
    events = load_table(spark, SF_DIR, "events")
    plan = (
        mad_outliers(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 2  # median pass + MAD pass, shared keying


def test_median_from_counts_equals_percentile(spark):
    """The count-store median primitive is bitwise the percentile of
    the expanded multiset — randomized groups, odd/even sizes, heavy
    duplicate mass."""
    import random

    from cassandra_iot_pipeline_spark.operators.stats import (
        median_from_counts,
    )

    rng = random.Random(3)
    rows = []
    for g in range(12):
        for _ in range(rng.randint(1, 9)):
            rows.append((g, rng.randint(-50, 50), rng.randint(1, 7)))
    counts = spark.createDataFrame(rows, "g BIGINT, u BIGINT, cnt BIGINT")
    counts = counts.groupBy("g", "u").agg(F.sum("cnt").alias("cnt"))
    got = {
        r["g"]: r["med"]
        for r in median_from_counts(counts, ["g"]).collect()
    }
    expanded = counts.select(
        "g", F.explode(F.array_repeat("u", F.col("cnt").cast("int"))).alias("u")
    )
    want = {
        r["g"]: r["m"]
        for r in expanded.groupBy("g")
        .agg(F.expr("percentile(u, 0.5)").alias("m"))
        .collect()
    }
    assert got == want
