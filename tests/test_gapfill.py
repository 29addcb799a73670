"""Hypertable gap-fill: dense spine + LOCF + linear interpolation
(operators/gapfill.py). Hand-computed semantics on a synthetic frame,
fixture-level DuckDB parity, and the plan shape (single raw-events
shuffle; one window Exchange serving all four fill frames)."""

from __future__ import annotations

import datetime as dt

import pytest

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators import gapfill
from tests.conftest import SF_DIR
from tools.oracle_check import compare


def _ts(hour: int, minute: int = 30) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute)


@pytest.fixture(scope="module")
def filled(spark):
    # user 1: observations in hours 0 (31.00), 3 (37.00) and 4
    # (two events, 10.00 + 11.01 -> mean 10505 millicents); hours 1-2
    # are gaps. user 2: a single hour -> a one-row spine, no gaps.
    rows = [
        (1, _ts(0), 31.00),
        (1, _ts(3), 37.00),
        (1, _ts(4, 10), 10.00),
        (1, _ts(4, 50), 11.01),
        (2, _ts(7), 5.55),
    ]
    events = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    out = gapfill.gapfill_hourly(events).orderBy("user_id", "bucket_us").collect()
    return {(r["user_id"], r["bucket_us"]): r for r in out}, out


def test_spine_is_dense_and_bounded_by_observations(filled):
    by_key, rows = filled
    u1 = [r for r in rows if r["user_id"] == 1]
    # hours 0..4 inclusive: 5 rows, first and last observed
    assert len(u1) == 5
    assert [r["is_gap"] for r in u1] == [False, True, True, False, False]
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and not u2[0]["is_gap"]


def test_locf_carries_last_observation(filled):
    by_key, rows = filled
    u1 = [r for r in rows if r["user_id"] == 1]
    # 31.00 -> 3100 cents -> 3_100_000 mc carried through hours 1-2
    assert [r["locf_millicents"] for r in u1] == [
        3_100_000,
        3_100_000,
        3_100_000,
        3_700_000,
        1_050_500,  # mean of 1000 + 1101 cents = 1050.5 cents
    ]


def test_linear_interpolation_is_exact_bigint(filled):
    by_key, rows = filled
    u1 = [r for r in rows if r["user_id"] == 1]
    # between 3_100_000 (h0) and 3_700_000 (h3): +600_000 over 3 hours
    assert [r["interp_millicents"] for r in u1] == [
        3_100_000,
        3_300_000,
        3_500_000,
        3_700_000,
        1_050_500,
    ]
    assert [r["n_events"] for r in u1] == [1, 0, 0, 1, 2]


def test_no_nulls_anywhere(filled):
    _, rows = filled
    for r in rows:
        assert None not in r.asDict().values()


def test_fixture_duckdb_parity(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    spark_pdf = gapfill.gapfill_hourly(events).toPandas()
    oracle_pdf = duck.sql(gapfill.gapfill_hourly_oracle()).df()
    assert compare(spark_pdf, oracle_pdf) == []


def test_library_stride_15min(spark, duck):
    """The general surface (r5 verdict item #5) at a non-hourly grain:
    15-minute buckets over a synthetic frame, checked hand-computed AND
    against the parameterized DuckDB twin."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 5), 10.00),
        (1, dt.datetime(2024, 1, 1, 0, 10), 20.00),  # same bucket: mean 15
        (1, dt.datetime(2024, 1, 1, 1, 0), 35.00),  # 3 gap buckets between
        (2, dt.datetime(2024, 1, 1, 2, 59, 59), 1.25),
    ]
    events = spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    out = (
        gapfill.gapfill(events, stride_seconds=900)
        .orderBy("user_id", "bucket_us")
        .collect()
    )
    u1 = [r for r in out if r["user_id"] == 1]
    assert len(u1) == 5  # 00:00, 00:15, 00:30, 00:45, 01:00
    assert [r["is_gap"] for r in u1] == [False, True, True, True, False]
    assert [r["n_events"] for r in u1] == [2, 0, 0, 0, 1]
    # mean(1000, 2000 cents) = 1500 cents = 1_500_000 milli-units
    assert [r["locf_milliunits"] for r in u1] == [1_500_000] * 4 + [3_500_000]
    # linear: +2_000_000 over 4 strides = +500_000 per bucket
    assert [r["interp_milliunits"] for r in u1] == [
        1_500_000, 2_000_000, 2_500_000, 3_000_000, 3_500_000,
    ]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["bucket_us"] == int(
        dt.datetime(2024, 1, 1, 2, 45, tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000
    duck.register("gf_events", events.toPandas())
    oracle_pdf = duck.sql(
        gapfill.gapfill_oracle(table="gf_events", stride_seconds=900)
    ).df()
    assert compare(
        gapfill.gapfill(events, stride_seconds=900).toPandas(), oracle_pdf
    ) == []


def test_library_pre_1970_epochs_floor_align(spark, duck):
    """r6 ADVICE: bucket alignment is FLOOR division, so negative
    epochs align to the grid's lower edge (a truncating cast would
    round toward zero and mis-bucket) — hand-checked and against the
    DuckDB twin's integer //."""
    rows = [
        (1, dt.datetime(1969, 12, 31, 23, 10), 10.00),  # epoch -3000s
        (1, dt.datetime(1970, 1, 1, 0, 40), 20.00),
    ]
    events = spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    out = (
        gapfill.gapfill(events, stride_seconds=3600)
        .orderBy("bucket_us")
        .collect()
    )
    # 23:10 belongs to the 23:00 bucket (floor), NOT the 00:00 bucket
    # a trunc-toward-zero would produce
    assert [r["bucket_us"] for r in out] == [
        -3600 * 1_000_000, 0,
    ]
    assert [r["is_gap"] for r in out] == [False, False]
    duck.register("gf_neg_events", events.toPandas())
    oracle_pdf = duck.sql(
        gapfill.gapfill_oracle(table="gf_neg_events", stride_seconds=3600)
    ).df()
    assert compare(
        gapfill.gapfill(events, stride_seconds=3600).toPandas(), oracle_pdf
    ) == []


def test_library_null_values_become_gaps(spark):
    """r5 ADVICE: an all-NULL-valued bucket is a GAP (count and sum
    cover the same rows), and every output column stays non-null."""
    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(1), None),  # whole bucket NULL-valued -> gap
        (1, _ts(2), 30.0),
        (1, _ts(2, 40), None),  # mixed bucket: NULL row excluded
    ]
    events = spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    out = gapfill.gapfill_hourly(events).orderBy("bucket_us").collect()
    assert [r["n_events"] for r in out] == [1, 0, 1]
    assert [r["is_gap"] for r in out] == [False, True, False]
    assert [r["interp_millicents"] for r in out] == [
        1_000_000, 2_000_000, 3_000_000,
    ]
    for r in out:
        assert None not in r.asDict().values()


def test_library_max_gap_truncates(spark):
    """max_gap bounds each observation's generated run; the grid
    resumes at the next observation, and rows within the bound still
    interpolate against the TRUE next anchor."""
    rows = [(1, _ts(0), 10.0), (1, _ts(10), 20.0)]
    events = spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    out = (
        gapfill.gapfill(events, max_gap=3)
        .orderBy("bucket_us")
        .collect()
    )
    # hours 0,1,2,3 (run capped at 3 gap buckets) then the hour-10 obs
    assert [r["bucket_us"] // 3_600_000_000 % 24 for r in out] == [0, 1, 2, 3, 10]
    assert [r["is_gap"] for r in out] == [False, True, True, True, False]
    # interp anchors remain the real next observation (hour 10)
    assert out[1]["interp_milliunits"] == 1_000_000 + (1_000_000 * 1) // 10
    assert out[3]["interp_milliunits"] == 1_000_000 + (1_000_000 * 3) // 10


def test_library_max_gap_error_mode(spark):
    rows = [(1, _ts(0), 10.0), (1, _ts(10), 20.0)]
    events = spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    ok = gapfill.gapfill(events, max_gap=9, on_long_gap="error").collect()
    assert len(ok) == 11  # bound not exceeded: full spine
    with pytest.raises(Exception, match="exceeds max_gap"):
        gapfill.gapfill(events, max_gap=3, on_long_gap="error").collect()
    with pytest.raises(ValueError, match="on_long_gap"):
        gapfill.gapfill(events, max_gap=3, on_long_gap="typo")


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — Spark DIV / DuckDB //
    semantics (Python // floors, which differs on negative quotients
    like a falling interpolation slope)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _gapfill_reference(rows, stride_sec=3600, max_gap=None, scale=2):
    """Pure-Python reference of gapfill() semantics: NULL pre-filter,
    stride-aligned bucket means in milli-units (trunc division), LOCF +
    trunc-division linear interpolation, per-observation gap runs
    bounded by max_gap. rows: (key, epoch_sec, value|None)."""
    from collections import defaultdict

    agg: dict = defaultdict(lambda: [0, 0])  # (k, bucket) -> [n, sum_units]
    for k, sec, v in rows:
        if v is None:
            continue
        b = (sec // stride_sec) * stride_sec
        cell = agg[(k, b)]
        cell[0] += 1
        cell[1] += round(v * 10**scale)
    by_key: dict = defaultdict(list)
    for (k, b), (n, su) in agg.items():
        by_key[k].append((b, n, _tdiv(su * 1000, n)))
    out = []
    for k, obs in by_key.items():
        obs.sort()
        for i, (b, n, mu) in enumerate(obs):
            nxt = obs[i + 1] if i + 1 < len(obs) else None
            if nxt is None:
                out.append((k, b * 1_000_000, n, mu, mu, False))
                continue
            nb, _, nmu = nxt
            run_end = nb - stride_sec
            if max_gap is not None:
                run_end = min(run_end, b + max_gap * stride_sec)
            pos, npos = b // stride_sec, nb // stride_sec
            for g in range(b, run_end + 1, stride_sec):
                gpos = g // stride_sec
                observed = gpos == pos
                interp = mu if observed else mu + _tdiv(
                    (nmu - mu) * (gpos - pos), npos - pos
                )
                out.append(
                    (k, g * 1_000_000, n if observed else 0, mu, interp,
                     not observed)
                )
    return sorted(out)


def test_randomized_reference_parity(spark):
    """Randomized cross-validation of the library surface against the
    pure-Python reference: seeded corpora with NULLs, rising AND
    falling slopes (negative interpolation deltas exercise the
    truncate-vs-floor division edge), multiple strides, and a max_gap
    configuration."""
    import random

    for seed, stride, max_gap in [(7, 3600, None), (11, 900, None), (13, 3600, 5)]:
        rng = random.Random(seed)
        rows = []
        for _ in range(400):
            k = rng.randrange(6)
            sec = rng.randrange(0, 3_000_000)
            # value = n/4: exact in binary, so unit scaling has no
            # rounding ambiguity between engines
            v = None if rng.random() < 0.1 else rng.randrange(0, 40_000) / 4
            rows.append((k, sec, v))
        events = spark.createDataFrame(
            [
                (k, dt.datetime.fromtimestamp(sec, dt.timezone.utc)
                 .replace(tzinfo=None), v)
                for k, sec, v in rows
            ],
            "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
        )
        got = sorted(
            tuple(r)
            for r in gapfill.gapfill(
                events, stride_seconds=stride, max_gap=max_gap
            ).collect()
        )
        assert got == _gapfill_reference(
            rows, stride_sec=stride, max_gap=max_gap
        ), f"seed={seed} stride={stride} max_gap={max_gap}"


def test_plan_shape(spark):
    events = load_table(spark, SF_DIR, "events")
    df = gapfill.gapfill_hourly(events)
    df.collect()  # run THIS queryExecution so AQE finalizes its plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    # the lead()-anchored formulation: ONE raw scan, the gap runs are
    # generated from the aggregate itself — no spine, no join back
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
    # exactly two exchanges: raw -> (user, bucket) aggregate, then the
    # lead() window over the ~10^3x-smaller hourly aggregate
    assert final.count("Exchange hashpartitioning") == 2
    assert final.count("Generate explode") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
