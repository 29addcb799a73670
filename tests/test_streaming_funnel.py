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


# --- horizon finalization -----------------------------------------------------


def test_finalize_equals_full_recompute(spark, tmp_path):
    """Declared-horizon finalization: closed users fold into one
    (k, hits) row each, their points leave the store, and the report
    stays BITWISE the full recompute (counts, rates, exact medians)
    for a horizon-respecting stream — across further epochs and a
    second finalize."""
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    # an advancing stream: each epoch a fresh user cohort one day on
    def cohort(day, users):
        rows = []
        for u in users:
            base = day * 1440
            rows.append((u, _t(base + 0), "a"))
            rows.append((u, _t(base + 10), "b"))
            if u % 2 == 0:
                rows.append((u, _t(base + 20), "c"))
        return rows

    batches = [cohort(d, range(10 * d, 10 * d + 4)) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    seen = [r for b in batches for r in b]
    pts_before = pipe.points(spark).count()

    # finalize with a 1-day lateness: day-0..1 cohorts close (anchor +
    # 1h horizon < max_time - 1d), day-2..3 stay live
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_users"] == 8
    assert pipe.points(spark).count() < pts_before  # GC actually bit
    want = funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)

    # more horizon-respecting epochs, then a second finalize
    batches2 = [cohort(d, range(10 * d, 10 * d + 4)) for d in (4, 5)]
    for j, rows in enumerate(batches2, start=4):
        pipe.write_batch(_frame(spark, rows), epoch_id=j)
    seen += [r for b in batches2 for r in b]
    assert _fx(pipe.funnel(spark)) == _fx(
        funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    )
    out2 = pipe.finalize(spark, lateness_seconds=86_400)
    assert out2["finalized_users"] > 0
    assert out2["watermark"] > out["watermark"]
    assert _fx(pipe.funnel(spark)) == _fx(
        funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    )
    assert pipe.quarantine_count(spark) == 0  # nothing violated


def test_finalized_user_late_arrival_is_quarantined_loudly(spark, tmp_path):
    """A horizon-VIOLATING point (event time under the finalization
    watermark) for a finalized user: the frozen report does not move,
    but the point is counted in quarantine — never silently dropped.
    A live user's late-but-legal point still folds."""
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    rows0 = [
        (1, _t(0), "a"), (1, _t(10), "b"),          # user 1: old, will close
        (2, _t(3 * 1440), "a"),                     # user 2: recent, live
    ]
    pipe.write_batch(_frame(spark, rows0), epoch_id=0)
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_users"] == 1
    frozen = _fx(pipe.funnel(spark))

    # user 1's chain-completing 'c' arrives with an event time far
    # under the watermark: a violation of the declared horizon
    late = [(1, _t(20), "c")]
    pipe.write_batch(_frame(spark, late), epoch_id=1)
    assert _fx(pipe.funnel(spark)) == frozen  # frozen, not corrupted
    q = pipe.quarantine(spark).collect()
    assert len(q) == 1 and q[0]["k"] == 1 and q[0]["s"] == 2
    assert pipe.quarantine_count(spark) == 1

    # user 2's late 'b' is ABOVE the watermark: legal, folds normally
    legal = [(2, _t(3 * 1440 + 10), "b")]
    pipe.write_batch(_frame(spark, legal), epoch_id=2)
    got = {r["step"]: r["n_users"] for r in pipe.funnel(spark).collect()}
    assert got["b"] == 2  # user 1 (frozen) + user 2 (live late point)
    assert pipe.quarantine_count(spark) == 1  # unchanged


def test_finalize_guards_and_noop_paths(spark, tmp_path):
    """finalize without a chain horizon raises; an empty store and a
    non-advancing watermark are no-ops."""
    nopipe = FunnelPipeline(str(tmp_path / "nh"), STEPS)
    with pytest.raises(ValueError, match="horizon_seconds"):
        nopipe.finalize(spark, lateness_seconds=60)

    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    assert pipe.finalize(spark, 60) == {
        "finalized_users": 0,
        "watermark": None,
    }
    pipe.write_batch(
        _frame(spark, [(1, _t(0), "a"), (1, _t(5), "b")]), epoch_id=0
    )
    out = pipe.finalize(spark, lateness_seconds=0)
    # lateness 0: cutoff == max us == the 'b' time; anchor+1h >= cutoff
    assert out["finalized_users"] == 0
    # nothing finalized -> reads equal the plain fold
    want = funnel(
        _frame(spark, [(1, _t(0), "a"), (1, _t(5), "b")]),
        STEPS,
        horizon_seconds=HOUR,
    )
    assert _fx(pipe.funnel(spark)) == _fx(want)


def test_streaming_wrapper_with_finalize_cadence(spark, tmp_path):
    """finalize_every wires the declared-horizon tier through the real
    foreachBatch path (the compact_every pattern): after the drain,
    closed users sit in fin/ and the report still equals the batch
    recompute. The mismatched-params guard raises."""
    with pytest.raises(ValueError, match="finalize_every"):
        FunnelPipeline(str(tmp_path / "x"), STEPS, finalize_every=2)

    src = tmp_path / "src"
    src.mkdir()
    batches = []
    for d in range(4):
        rows = []
        for u in range(10 * d, 10 * d + 3):
            base = d * 1440
            rows.append((u, _t(base), "a"))
            rows.append((u, _t(base + 10), "b"))
        batches.append(rows)
    for i, rows in enumerate(batches):
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
        finalize_every=2,
        finalize_lateness_seconds=86_400,
    )
    q.awaitTermination()
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    assert pipe.fin_watermark(spark) is not None  # the cadence fired
    seen = [r for b in batches for r in b]
    want = funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)


def test_trend_served_from_store_and_fin_rows(spark, tmp_path):
    """The per-anchor-period trend view served from the store equals
    the batch funnel_trend over the concatenated events — before AND
    after finalization (finalized hits rows carry their anchor)."""
    from cassandra_iot_pipeline_spark.operators.funnel import funnel_trend

    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )

    def cohort(day, users):
        rows = []
        for u in users:
            base = day * 1440
            rows.append((u, _t(base + 0), "a"))
            rows.append((u, _t(base + 10), "b"))
            if u % 2 == 0:
                rows.append((u, _t(base + 20), "c"))
        return rows

    batches = [cohort(d, range(10 * d, 10 * d + 4)) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    seen = [r for b in batches for r in b]
    want = _fx(
        funnel_trend(_frame(spark, seen), STEPS, 86_400, horizon_seconds=HOUR)
    )
    assert _fx(pipe.trend(spark, 86_400)) == want
    assert pipe.finalize(spark, lateness_seconds=86_400)[
        "finalized_users"
    ] == 8
    assert _fx(pipe.trend(spark, 86_400)) == want
