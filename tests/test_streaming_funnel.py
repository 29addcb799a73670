"""Continuously-maintained funnel (streaming/funnel.py): epoch-by-
epoch maintenance equals one batch funnel over the concatenated
events (including a late re-anchoring step-0 event), replay is
idempotent, compaction is reader-invisible, the generalized key
schema works, and the foreachBatch wiring runs end-to-end."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_iot_pipeline_spark.operators.funnel import funnel
from cassandra_iot_pipeline_spark.streaming.funnel import (
    FunnelPipeline,
    streaming_funnel,
)

SCHEMA = "user_id BIGINT, ts TIMESTAMP, event_type STRING"
STEPS = ["a", "b", "c"]
HOUR = 3600


def _t(minutes: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


BATCHES = [
    [(1, _t(10), "a"), (2, _t(0), "a"), (1, _t(20), "b")],
    [(1, _t(30), "c"), (2, _t(5), "b")],
    [(3, _t(0), "b"), (3, _t(1), "a")],        # b before a: no chain yet
    # late re-anchor: user 1's EARLIER a arrives after their chain
    # completed; with a horizon this un-qualifies later steps
    [(1, _t(-200), "a"), (3, _t(2), "b")],
]
ALL = [r for b in BATCHES for r in b]


def _frame(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _fx(df):
    return sorted(tuple(r) for r in df.collect())


def test_epochs_equal_one_batch_funnel(spark, tmp_path):
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR,
        compact_every=2,
    )
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    want = funnel(_frame(spark, ALL), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)


def test_late_event_reanchors_the_chain(spark, tmp_path):
    """Before batch 3, user 1 completes a->b->c inside the horizon;
    the late earlier 'a' re-anchors them and the horizon cuts b and c
    — the non-monotone case that forces the on-read design."""
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    for i, rows in enumerate(BATCHES[:3]):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    mid = {r["step"]: r["n_users"] for r in pipe.funnel(spark).collect()}
    # user 1: a->b->c inside the horizon; user 2: a->b; user 3: only a
    # (their b precedes their a)
    assert mid == {"a": 3, "b": 2, "c": 1}
    pipe.write_batch(_frame(spark, BATCHES[3]), epoch_id=3)
    after = {r["step"]: r["n_users"] for r in pipe.funnel(spark).collect()}
    # user 1's anchor moved to t=-200 min; b@20' and c@30' are now
    # >1 h after it — their chain dies; user 3's late b@2' completes
    # a(1')->b(2')
    assert after == {"a": 3, "b": 2, "c": 0}


def test_replay_is_idempotent(spark, tmp_path):
    pipe = FunnelPipeline(str(tmp_path / "store"), STEPS)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    before = _fx(pipe.funnel(spark))
    n_pts = pipe.points(spark).count()
    pipe.write_batch(_frame(spark, BATCHES[1]), epoch_id=1)  # replay
    assert _fx(pipe.funnel(spark)) == before
    assert pipe.points(spark).count() == n_pts


def test_compaction_is_reader_invisible(spark, tmp_path):
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    for i, rows in enumerate(BATCHES[:3]):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    pre = _fx(pipe.funnel(spark))
    assert pipe.compact(spark) == 2
    assert _fx(pipe.funnel(spark)) == pre
    pipe.write_batch(_frame(spark, BATCHES[3]), epoch_id=3)
    want = funnel(_frame(spark, ALL), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)


def test_generalized_key_schema(spark, tmp_path):
    schema = "device_code STRING, ts TIMESTAMP, event_type STRING"
    rows = [("x", _t(0), "a"), ("x", _t(1), "b"), ("y", _t(0), "a")]
    pipe = FunnelPipeline(
        str(tmp_path / "store"),
        ["a", "b"],
        key="device_code",
        updates_schema=schema,
    )
    pipe.write_batch(_frame(spark, rows, schema), epoch_id=0)
    want = funnel(_frame(spark, rows, schema), ["a", "b"],
                  key="device_code")
    assert _fx(pipe.funnel(spark)) == _fx(want)
    with pytest.raises(ValueError, match="absent from events schema"):
        FunnelPipeline(
            str(tmp_path / "s2"), ["a", "b"], key="nope",
            updates_schema=schema,
        )


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        table = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_funnel(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        STEPS,
        horizon_seconds=HOUR,
        compact_every=2,
    )
    q.awaitTermination()
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    want = funnel(_frame(spark, ALL), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)
