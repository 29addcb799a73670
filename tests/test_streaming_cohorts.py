"""Continuously-maintained cohort retention (streaming/cohorts.py):
epoch-by-epoch maintenance equals one batch retention_matrix over the
concatenated events, replay rewrites identical content, compaction is
reader-invisible, the generalized key schema works, and the
foreachBatch wiring runs end-to-end."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_iot_pipeline_spark.operators.cohorts import retention_matrix
from cassandra_iot_pipeline_spark.streaming.cohorts import (
    CohortPipeline,
    streaming_cohorts,
)

SCHEMA = "user_id BIGINT, ts TIMESTAMP"
DAY = 86_400


def _day(n: int, hour: int = 12) -> dt.datetime:
    return dt.datetime(1970, 1, 1) + dt.timedelta(days=n, hours=hour)


BATCHES = [
    [(1, _day(0)), (2, _day(0)), (1, _day(0, hour=20))],
    [(1, _day(1)), (3, _day(1))],
    [(3, _day(2)), (1, _day(3))],
    # late event: user 2's first period moves EARLIER than its
    # previously-known cohort would have been if 2 had appeared later
    [(2, _day(3)), (4, _day(2))],
]


def _frame(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _mx(df):
    return sorted(tuple(r) for r in df.collect())


def test_epochs_equal_one_batch_matrix(spark, tmp_path):
    pipe = CohortPipeline(
        str(tmp_path / "store"), period_seconds=DAY, compact_every=2
    )
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    want = retention_matrix(
        _frame(spark, [r for b in BATCHES for r in b]), period_seconds=DAY
    )
    assert _mx(pipe.matrix(spark)) == _mx(want)
    assert pipe.matrix(spark).count() >= 5


def test_replay_is_idempotent_and_store_stays_distinct(spark, tmp_path):
    pipe = CohortPipeline(str(tmp_path / "store"), period_seconds=DAY)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    before = _mx(pipe.matrix(spark))
    n_pts = pipe.points(spark).count()
    pipe.write_batch(_frame(spark, BATCHES[1]), epoch_id=1)  # replay
    assert _mx(pipe.matrix(spark)) == before
    assert pipe.points(spark).count() == n_pts
    # the folded store is one row per (user, period) exactly
    assert n_pts == pipe.points(spark).distinct().count()


def test_compaction_is_reader_invisible(spark, tmp_path):
    pipe = CohortPipeline(str(tmp_path / "store"), period_seconds=DAY)
    for i, rows in enumerate(BATCHES[:3]):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    pre = _mx(pipe.matrix(spark))
    assert pipe.compact(spark) == 2
    assert _mx(pipe.matrix(spark)) == pre
    pipe.write_batch(_frame(spark, BATCHES[3]), epoch_id=3)
    want = retention_matrix(
        _frame(spark, [r for b in BATCHES for r in b]), period_seconds=DAY
    )
    assert _mx(pipe.matrix(spark)) == _mx(want)


def test_generalized_key_schema(spark, tmp_path):
    schema = "device_code STRING, ts TIMESTAMP"
    rows = [("a", _day(0)), ("b", _day(0)), ("a", _day(1))]
    pipe = CohortPipeline(
        str(tmp_path / "store"),
        key="device_code",
        period_seconds=DAY,
        updates_schema=schema,
    )
    pipe.write_batch(_frame(spark, rows, schema), epoch_id=0)
    want = retention_matrix(
        _frame(spark, rows, schema), key="device_code", period_seconds=DAY
    )
    assert _mx(pipe.matrix(spark)) == _mx(want)
    with pytest.raises(ValueError, match="absent from events schema"):
        CohortPipeline(
            str(tmp_path / "s2"), key="nope", updates_schema=schema
        )


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        table = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_cohorts(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        period_seconds=DAY,
        compact_every=2,
    )
    q.awaitTermination()
    pipe = CohortPipeline(str(tmp_path / "store"), period_seconds=DAY)
    want = retention_matrix(
        _frame(spark, [r for b in BATCHES for r in b]), period_seconds=DAY
    )
    assert _mx(pipe.matrix(spark)) == _mx(want)


def test_live_rolling_active_equals_batch(spark, tmp_path):
    from cassandra_iot_pipeline_spark.operators.cohorts import (
        rolling_active,
    )

    pipe = CohortPipeline(str(tmp_path / "store"), period_seconds=DAY)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    for w in (1, 3):
        got = _mx(pipe.rolling_active(spark, window_periods=w))
        want = _mx(
            rolling_active(
                _frame(spark, [r for b in BATCHES for r in b]),
                window_periods=w,
                period_seconds=DAY,
            )
        )
        assert got == want, w


def test_live_growth_accounting_equals_batch(spark, tmp_path):
    from cassandra_iot_pipeline_spark.operators.cohorts import (
        growth_accounting,
    )

    pipe = CohortPipeline(str(tmp_path / "store"), period_seconds=DAY)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    got = _mx(pipe.growth_accounting(spark))
    want = _mx(
        growth_accounting(
            _frame(spark, [r for b in BATCHES for r in b]),
            period_seconds=DAY,
        )
    )
    assert got == want
