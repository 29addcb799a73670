"""Event-transition analysis (operators/paths.py): hand-computed
matrix, deterministic same-timestamp tiebreak, fixture DuckDB parity,
row-stochastic invariant, and the plan shape."""

from __future__ import annotations

import datetime as dt

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.paths import (
    event_transitions,
    event_transitions_oracle,
    top_paths,
    top_paths_oracle,
)
from tests.conftest import SF_DIR
from tools.oracle_check import compare

SCHEMA = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING"


def _t(minutes: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_hand_computed_matrix(spark):
    """User 1: a->b->a (transitions a->b, b->a); user 2: a->a.
    Matrix: a->b 1, b->a 1, a->a 1; src 'a' out-degree 2."""
    rows = [
        (1, 1, _t(0), "a"), (2, 1, _t(1), "b"), (3, 1, _t(2), "a"),
        (4, 2, _t(0), "a"), (5, 2, _t(1), "a"),
    ]
    got = {
        (r["src"], r["dst"]): (r["n"], r["out_total"], r["prob"])
        for r in event_transitions(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert got == {
        ("a", "b"): (1, 2, 0.5),
        ("a", "a"): (1, 2, 0.5),
        ("b", "a"): (1, 1, 1.0),
    }


def test_same_timestamp_tiebreak(spark):
    """Two events at the same microsecond order by event_id — the
    total order is deterministic, not arrival-dependent."""
    rows = [
        (10, 1, _t(0), "a"),
        (12, 1, _t(1), "c"),   # higher id, same ts as 'b'
        (11, 1, _t(1), "b"),   # lower id wins the tie: a->b->c
    ]
    got = {
        (r["src"], r["dst"]) for r in event_transitions(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert got == {("a", "b"), ("b", "c")}


def test_fixture_duckdb_parity(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    got = event_transitions(events).toPandas()
    want = duck.sql(event_transitions_oracle()).df()
    assert compare(got, want) == []
    assert len(got) == 25  # 5 types, all pairs occur at fixture scale


def test_row_stochastic(spark):
    events = load_table(spark, SF_DIR, "events")
    pdf = event_transitions(events).toPandas()
    sums = pdf.groupby("src")["prob"].sum()
    assert ((sums - 1.0).abs() < 1e-9).all()
    by_src = pdf.groupby("src")["n"].sum()
    tot = pdf.groupby("src")["out_total"].first()
    assert (by_src == tot).all()


def test_top_paths_hand_computed(spark):
    """User 1: a,b,a,b -> length-3 paths a>b>a, b>a>b; user 2: a,a,a
    -> a>a>a; paths never cross users."""
    rows = [
        (1, 1, _t(0), "a"), (2, 1, _t(1), "b"),
        (3, 1, _t(2), "a"), (4, 1, _t(3), "b"),
        (5, 2, _t(0), "a"), (6, 2, _t(1), "a"), (7, 2, _t(2), "a"),
    ]
    got = [
        (r["path"], r["n"])
        for r in top_paths(
            spark.createDataFrame(rows, SCHEMA), length=3, k=10
        ).collect()
    ]
    # counts all 1 -> deterministic path-string order
    assert got == [("a>a>a", 1), ("a>b>a", 1), ("b>a>b", 1)]


def test_top_paths_fixture_parity(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    for length, k in [(2, 30), (3, 20), (4, 15)]:
        got = top_paths(events, length=length, k=k).toPandas()
        want = duck.sql(top_paths_oracle(length=length, k=k)).df()
        assert compare(got, want) == [], length


def test_plan_two_data_exchanges(spark):
    """One exchange for the per-key ordering window, one partial-
    aggregated exchange for the matrix; the row-total window runs
    over the matrix, not the events."""
    import re

    from cassandra_iot_pipeline_spark.plans import formatted_plan

    events = load_table(spark, SF_DIR, "events")
    plan = formatted_plan(event_transitions(events))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3
    assert "partial_count" in plan
