"""Watermark-lateness accounting (streaming/lateness.py): hand-planted
late events counted against the strictly-prior-epoch watermark, the
first epoch drops nothing by construction, replay idempotence (the
prior-epoch discipline), compaction invisibility, and the tuning
recommendation."""

from __future__ import annotations

import datetime as dt

from cassandra_iot_pipeline_spark.streaming.lateness import (
    LatenessPipeline,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP"


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 6, 1, minute // 60, minute % 60, second)


BATCHES = [
    # epoch 0: clean, max event time = minute 10
    [(1, _t(5)), (2, _t(10))],
    # epoch 1 vs wm(min 10): minute 8 is 2 min late (drops at 60s,
    # survives 600s), minute 11 on time
    [(3, _t(8)), (4, _t(11))],
    # epoch 2 vs wm(min 11): minute 0 is 11 min late (drops at 60s
    # AND 600s, survives 3600s), minute 12 on time
    [(5, _t(0)), (6, _t(12))],
]


def _frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _run(spark, tmp_path, compact_every=None):
    pipe = LatenessPipeline(
        str(tmp_path / "s"), compact_every=compact_every
    )
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    return pipe


def test_hand_planted_lateness(spark, tmp_path):
    pipe = _run(spark, tmp_path)
    h = {r["epoch"]: r for r in pipe.history(spark).collect()}
    assert h[0]["wm_before_us"] is None
    assert (h[0]["dropped_60s"], h[0]["dropped_600s"]) == (0, 0)
    assert h[1]["dropped_60s"] == 1  # minute 8 vs wm minute 10
    assert h[1]["dropped_600s"] == 0
    assert h[2]["dropped_60s"] == 1  # minute 0 vs wm minute 11
    assert h[2]["dropped_600s"] == 1
    assert h[2]["dropped_3600s"] == 0
    # lag of the minute-0 event vs wm minute 11
    assert h[2]["max_lag_us"] == 11 * 60 * 1_000_000
    # the watermark only ever advances
    assert h[2]["wm_before_us"] > h[1]["wm_before_us"]


def test_replay_is_idempotent(spark, tmp_path):
    pipe = _run(spark, tmp_path)
    before = sorted(tuple(r) for r in pipe.history(spark).collect())
    # replaying epoch 1 AFTER epoch 2 exists must not see epoch 2's
    # higher max (the strictly-prior discipline)
    pipe.write_batch(_frame(spark, BATCHES[1]), epoch_id=1)
    assert sorted(tuple(r) for r in pipe.history(spark).collect()) == before


def test_compaction_invisible(spark, tmp_path):
    pipe = _run(spark, tmp_path, compact_every=2)
    before = sorted(tuple(r) for r in pipe.history(spark).collect())
    assert pipe.compact(spark) in (None, 2)
    assert sorted(tuple(r) for r in pipe.history(spark).collect()) == before


def test_recommendation(spark, tmp_path):
    pipe = _run(spark, tmp_path)
    # 6 events, drops: 60s -> 2, 600s -> 1, 3600s -> 0
    rec = pipe.recommendation(spark, max_drop_rate=0.0)
    assert rec["n_events"] == 6
    assert rec["rates"][60] == 2 / 6
    assert rec["rates"][600] == 1 / 6
    assert rec["rates"][3600] == 0.0
    assert rec["delay_s"] == 3600
    # a 20% tolerance accepts the 600s delay, not the 60s one
    assert pipe.recommendation(spark, max_drop_rate=0.2)["delay_s"] == 600
    # nothing qualifies under an impossible tolerance against 60s-only
    p2 = LatenessPipeline(str(tmp_path / "s2"), delays_s=(60,))
    for i, rows in enumerate(BATCHES):
        p2.write_batch(_frame(spark, rows), epoch_id=i)
    assert p2.recommendation(spark, max_drop_rate=0.0)["delay_s"] is None
