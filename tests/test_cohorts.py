"""Cohort retention (operators/cohorts.py): hand-computed matrix,
fixture-scale DuckDB parity (displaced-registry discipline), offset-0
invariants, and the plan shape (no third shuffle for the user join;
the rate window runs over the matrix, not the events)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators import cohorts
from tests.conftest import SF_DIR
from tools.oracle_check import compare

DAY = 86_400


def _frame(spark, rows):
    return spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP")


def _day(n: int, hour: int = 12) -> dt.datetime:
    return dt.datetime(1970, 1, 1) + dt.timedelta(days=n, hours=hour)


def test_hand_computed_matrix(spark):
    """Daily periods over epoch-day 0..3: users 1,2 start day 0 (user
    1 returns day 1 and day 3, user 2 never returns), user 3 starts
    day 1 and returns day 2. Multiple events inside one period count
    once (the distinct)."""
    rows = [
        (1, _day(0)), (1, _day(0, hour=20)), (1, _day(1)), (1, _day(3)),
        (2, _day(0)),
        (3, _day(1)), (3, _day(2)),
    ]
    got = {
        (r["cohort_idx"], r["offset_periods"]): (
            r["n_users"], r["cohort_size"], r["retention"]
        )
        for r in cohorts.retention_matrix(
            _frame(spark, rows), period_seconds=DAY
        ).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (1, 2, 0.5),
        (0, 3): (1, 2, 0.5),
        (1, 0): (1, 1, 1.0),
        (1, 1): (1, 1, 1.0),
    }


def test_fixture_duckdb_parity(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    for period in (cohorts.WEEK_SECONDS, DAY):
        spark_pdf = cohorts.retention_matrix(
            events, period_seconds=period
        ).toPandas()
        oracle_pdf = duck.sql(
            cohorts.retention_matrix_oracle(period_seconds=period)
        ).df()
        assert compare(spark_pdf, oracle_pdf) == [], period
    assert len(spark_pdf) > 1


def test_offset_zero_invariants(spark):
    """Every cohort has an offset-0 row, its n_users equals
    cohort_size, and retention never exceeds 1.0."""
    events = load_table(spark, SF_DIR, "events")
    rows = cohorts.retention_matrix(events, period_seconds=DAY).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_idx"], []).append(r)
        assert 0.0 < r["retention"] <= 1.0
    for c, rs in by_cohort.items():
        zero = [r for r in rs if r["offset_periods"] == 0]
        assert len(zero) == 1, c
        assert zero[0]["n_users"] == zero[0]["cohort_size"]
        assert zero[0]["retention"] == 1.0


def test_plan_shape(spark):
    events = load_table(spark, SF_DIR, "events")
    df = cohorts.retention_matrix(events)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # r8 plan: ONE user-keyed aggregation over the events (the only
    # events-wide exchange), explode + matrix groupBy (exchange over
    # per-user distinct periods), rate window over the matrix — and
    # NO join anywhere (the r7 plan joined a distinct set back to the
    # cohorts and re-exchanged it by user)
    assert "Join" not in final
    assert final.count("Exchange hashpartitioning") <= 3


def test_rolling_active_hand_computed(spark):
    """Daily periods, 3-day window. User 1 active days 0 and 4; user
    2 active day 1. WAU-style ends: day 0 {1}, day 1 {1,2}, day 2
    {1,2}, day 3 {2}, day 4 {1}. Day 3 has NO events but still counts
    user 2 (active day 1, window {1,2,3})."""
    from cassandra_iot_pipeline_spark.operators.cohorts import (
        rolling_active,
    )

    rows = [(1, _day(0)), (1, _day(4)), (2, _day(1))]
    got = {
        r["pi"]: r["n_active"]
        for r in rolling_active(
            _frame(spark, rows), window_periods=3, period_seconds=DAY
        ).collect()
    }
    assert got == {0: 1, 1: 2, 2: 2, 3: 1, 4: 1}


def test_rolling_active_fixture_parity(spark, duck):
    from cassandra_iot_pipeline_spark.operators.cohorts import (
        rolling_active,
        rolling_active_oracle,
    )
    from tools.oracle_check import compare

    events = load_table(spark, SF_DIR, "events")
    for w, p in [(7, DAY), (1, DAY), (4, cohorts.WEEK_SECONDS)]:
        got = rolling_active(events, w, period_seconds=p).toPandas()
        want = duck.sql(
            rolling_active_oracle(w, period_seconds=p)
        ).df()
        assert compare(got, want) == [], (w, p)


def test_rolling_active_window_ordering(spark):
    """DAU <= WAU <= MAU <= total distinct users, period by period."""
    from cassandra_iot_pipeline_spark.operators.cohorts import (
        rolling_active,
    )

    events = load_table(spark, SF_DIR, "events")
    total = events.select("user_id").distinct().count()
    frames = {
        w: {
            r["pi"]: r["n_active"]
            for r in rolling_active(
                events, w, period_seconds=DAY
            ).collect()
        }
        for w in (1, 7, 28)
    }
    for pi, dau in frames[1].items():
        wau = frames[7].get(pi, 0)
        mau = frames[28].get(pi, 0)
        assert dau <= wau <= mau <= total, pi


def test_growth_accounting_hand_computed(spark):
    """User 1 active days 0,1,3; user 2 active day 1 only.
    Day 0: active{1}=new. Day 1: 1 retained, 2 new. Day 2: nobody
    active, both churn (1 resurfaces later — still churned at 2).
    Day 3: 1 resurrected."""
    from cassandra_iot_pipeline_spark.operators.cohorts import (
        growth_accounting,
    )

    rows = [(1, _day(0)), (1, _day(1)), (1, _day(3)), (2, _day(1))]
    got = {
        r["pi"]: (
            r["n_active"], r["n_new"], r["n_retained"],
            r["n_resurrected"], r["n_churned"],
        )
        for r in growth_accounting(
            _frame(spark, rows), period_seconds=DAY
        ).collect()
    }
    assert got == {
        0: (1, 1, 0, 0, 0),
        1: (2, 1, 1, 0, 0),
        2: (0, 0, 0, 0, 2),
        3: (1, 0, 0, 1, 0),
    }


def test_growth_accounting_fixture_parity_and_identities(spark, duck):
    from cassandra_iot_pipeline_spark.operators.cohorts import (
        growth_accounting,
        growth_accounting_oracle,
    )
    from tools.oracle_check import compare

    events = load_table(spark, SF_DIR, "events")
    for p in (DAY, cohorts.WEEK_SECONDS):
        got = growth_accounting(events, period_seconds=p).toPandas()
        want = duck.sql(growth_accounting_oracle(period_seconds=p)).df()
        assert compare(got, want) == [], p
        g = got.sort_values("pi").reset_index(drop=True)
        assert (
            g.n_active == g.n_new + g.n_retained + g.n_resurrected
        ).all()
        # churned(pi) = active(pi-1) - retained(pi), row-by-row
        for i in range(1, len(g)):
            assert (
                g.n_churned.iloc[i]
                == g.n_active.iloc[i - 1] - g.n_retained.iloc[i]
            ), g.pi.iloc[i]


# -- segmented retention -----------------------------------------------------


def _seg_dim(spark, rows):
    return spark.createDataFrame(rows, "user_id BIGINT, segment STRING")


def test_segmented_hand_computed_and_null_segment(spark):
    events = _frame(
        spark,
        [
            (1, _day(0)), (1, _day(1)),
            (2, _day(0)),
            (3, _day(0)), (3, _day(1)),
            (9, _day(0)),  # not in the dimension -> NULL segment
        ],
    )
    dim = _seg_dim(spark, [(1, "ads"), (2, "ads"), (3, "organic")])
    got = {
        (r["segment"], r["cohort_idx"], r["offset_periods"]): (
            r["n_users"], r["cohort_size"], r["retention"]
        )
        for r in cohorts.retention_matrix_segmented(
            events, dim, period_seconds=DAY
        ).collect()
    }
    assert got == {
        ("ads", 0, 0): (2, 2, 1.0),
        ("ads", 0, 1): (1, 2, 0.5),
        ("organic", 0, 0): (1, 1, 1.0),
        ("organic", 0, 1): (1, 1, 1.0),
        (None, 0, 0): (1, 1, 1.0),
    }


def test_segmented_slices_equal_plain_matrices(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    dim = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    seg = cohorts.retention_matrix_segmented(
        events, dim, period_seconds=DAY
    )
    # each non-null segment's slice == the plain matrix over that
    # segment's users' events
    segs = [r["segment"] for r in dim.select("segment").distinct().collect()]
    users_by_seg = {
        s: [r["user_id"] for r in dim.filter(F.col("segment") == s).collect()]
        for s in segs
    }
    for s in segs:
        sl = sorted(
            tuple(r)[1:]
            for r in seg.filter(F.col("segment") == s).collect()
        )
        plain = cohorts.retention_matrix(
            events.filter(F.col("user_id").isin(users_by_seg[s])),
            period_seconds=DAY,
        )
        assert sl == sorted(tuple(r) for r in plain.collect()), s


def test_segmented_fixture_duckdb_parity(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    dim = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    got = cohorts.retention_matrix_segmented(
        events, dim, period_seconds=DAY
    ).toPandas()
    want = duck.sql(
        cohorts.retention_matrix_segmented_oracle(
            segments_sql=(
                "SELECT c_custkey AS user_id, c_mktsegment AS segment"
                " FROM customer"
            ),
            period_seconds=DAY,
        )
    ).df()
    assert compare(got, want) == []


def test_segmented_dimension_joins_broadcast(spark):
    events = load_table(spark, SF_DIR, "events")
    dim = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    plan = (
        cohorts.retention_matrix_segmented(events, dim)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
