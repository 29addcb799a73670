"""Data-quality expectations (functions/expectations.py): planted
defects trip exactly the right checks, DuckDB parity on the fixture
audits, the NULL contract, the approx path's bounds, and the plan
shape (one aggregation pass — a single scan of the input)."""

from __future__ import annotations

import pytest

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions import expectations as X
from cassandra_iot_pipeline_spark.plans import formatted_plan
from tests.conftest import SF_DIR
from tools.oracle_check import compare


def _report(spark, rows, schema, checks):
    df = X.expectations_report(spark.createDataFrame(rows, schema), checks)
    return {r["check_name"]: r for r in df.collect()}


def test_planted_defects_trip_the_right_checks(spark):
    """One null id, one duplicate id, one out-of-range value, one
    unknown category — each trips its own check and no other."""
    rows = [
        (1, "view", 10.0),
        (1, "view", 20.0),      # duplicate id
        (None, "view", 30.0),   # null id
        (3, "alien", 40.0),     # unknown category
        (4, "view", -5.0),      # out of range
    ]
    got = _report(
        spark, rows, "id BIGINT, cat STRING, v DOUBLE",
        [
            X.Completeness("id"),
            X.Uniqueness("id"),
            X.AcceptedValues("cat", ("view", "click")),
            X.InRange("v", 0.0, 100.0),
            X.RowCount(5, 5),
        ],
    )
    assert got["completeness(id)"]["metric"] == 0.8
    assert not got["completeness(id)"]["passed"]
    assert got["uniqueness(id)"]["metric"] == 0.75  # 3 distinct / 4 non-null
    assert not got["uniqueness(id)"]["passed"]
    assert got["accepted_values(cat)"]["metric"] == 0.8
    assert got["in_range(v, 0.0, 100.0)"]["metric"] == 0.8
    assert got["row_count(5..5)"]["passed"]


def test_all_null_column_yields_null_metric(spark):
    got = _report(
        spark, [(None,), (None,)], "v DOUBLE",
        [X.InRange("v", 0.0, 1.0), X.Completeness("v")],
    )
    assert got["in_range(v, 0.0, 1.0)"]["metric"] is None
    assert got["in_range(v, 0.0, 1.0)"]["passed"] is None
    assert got["completeness(v)"]["metric"] == 0.0


def test_row_count_envelope(spark):
    rows = [(i,) for i in range(7)]
    got = _report(spark, rows, "id BIGINT", [X.RowCount(1, 5), X.RowCount(7)])
    assert not got["row_count(1..5)"]["passed"]
    assert got["row_count(>=7)"]["passed"]
    assert got["row_count(>=7)"]["metric"] == 7.0


def test_fixture_duckdb_parity(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    spark_pdf = X.events_expectations(events).toPandas()
    oracle_pdf = duck.sql(X.events_expectations_oracle()).df()
    assert compare(spark_pdf, oracle_pdf) == []
    assert spark_pdf["passed"].all()

    docs = load_table(spark, SF_DIR, "documents")
    checks = [
        X.Completeness("text"),
        X.Uniqueness("doc_id"),
        X.MatchesRegex("lang", "^[a-z]{2}$"),
        X.AcceptedValues("source", ("web",), min_frac=0.9),
        X.RowCount(1, 10),
    ]
    spark_pdf = X.expectations_report(docs, checks).toPandas()
    oracle_pdf = duck.sql(X.expectations_oracle(checks, "documents")).df()
    assert compare(spark_pdf, oracle_pdf) == []


def test_approx_uniqueness_bounds_and_no_oracle(spark):
    """The approx path (the 100 TB default for wide audits) lands
    within HLL++ error of the exact count and refuses an oracle."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        r["check_name"]: r["metric"]
        for r in X.expectations_report(
            docs, [X.Uniqueness("doc_id")]
        ).collect()
    }["uniqueness(doc_id)"]
    approx = {
        r["check_name"]: r["metric"]
        for r in X.expectations_report(
            docs, [X.Uniqueness("doc_id", approx=True)]
        ).collect()
    }["uniqueness(doc_id)"]
    assert abs(approx - exact) / exact < 0.15
    with pytest.raises(ValueError):
        X.expectations_oracle([X.Uniqueness("doc_id", approx=True)])


def test_single_scan_plan(spark):
    """The whole audit is one aggregation over one scan: exactly one
    parquet scan node, no join, no window."""
    events = load_table(spark, SF_DIR, "events")
    plan = formatted_plan(X.events_expectations(events))
    # one "Location:" line per scan node in the formatted detail
    assert plan.count("Location:") == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_rejects_empty_checks(spark):
    with pytest.raises(ValueError):
        X.expectations_report(None, [])
