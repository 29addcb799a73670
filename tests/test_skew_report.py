"""Skew audit (operators/skew.py::skew_report / skew_summary):
fixture-scale DuckDB parity (displaced-registry discipline), the
planted hot-key case the audit exists to catch, and the plan shape
(partial-aggregable groupBy + TakeOrderedAndProject, no full sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators import skew
from tests.conftest import SF_DIR
from tools.oracle_check import compare


def test_fixture_duckdb_parity(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    for fn, oracle in (
        (skew.skew_report, skew.skew_report_oracle),
        (skew.skew_summary, skew.skew_summary_oracle),
    ):
        spark_pdf = fn(events).toPandas()
        oracle_pdf = duck.sql(oracle()).df()
        assert compare(spark_pdf, oracle_pdf) == [], fn.__name__
    # composite keys too
    spark_pdf = skew.skew_report(events, ("user_id", "event_type"), 5).toPandas()
    oracle_pdf = duck.sql(
        skew.skew_report_oracle(key_cols=("user_id", "event_type"), top_n=5)
    ).df()
    assert compare(spark_pdf, oracle_pdf) == []


def test_planted_hot_key(spark):
    """A key carrying 50% of all rows shows up as rank 1 with share
    0.5 and drives skew_factor to ~n_keys/2 — the number the salting
    docstring tells the operator to look at."""
    rows = [(0, i) for i in range(500)] + [
        (k, i) for k in range(1, 101) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, x BIGINT")
    top = skew.skew_report(df, "user_id", 3).collect()
    assert top[0]["user_id"] == 0 and top[0]["n_rows"] == 500
    assert top[0]["share"] == 500 / 1000
    assert top[0]["cum_share"] == 500 / 1000
    assert top[1]["cum_share"] == 505 / 1000
    s = skew.skew_summary(df, "user_id").collect()[0]
    assert (s["n_keys"], s["n_rows"], s["max_key_rows"]) == (101, 1000, 500)
    assert s["skew_factor"] == 500.0 / (1000.0 / 101.0)
    # flat corpus: factor == 1.0 exactly
    flat = spark.createDataFrame(
        [(k, i) for k in range(20) for i in range(5)],
        "user_id BIGINT, x BIGINT",
    )
    assert skew.skew_summary(flat, "user_id").collect()[0]["skew_factor"] == 1.0


def test_plan_shape(spark):
    events = load_table(spark, SF_DIR, "events")
    df = skew.skew_report(events, "user_id", 10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # top-N never globally sorts: TakeOrderedAndProject; the per-key
    # count shuffles ONCE and the grand total REUSES that exchange
    # (its own exchange is a one-row-per-task SinglePartition fold)
    assert "TakeOrderedAndProject" in final
    assert "ReusedExchange" in final
    assert final.count("Exchange hashpartitioning") <= 2  # 1 + the reuse's description line
    assert "Sort " not in final.replace("TakeOrderedAndProject", "")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
