"""Continuous seasonal baselines (streaming/baselines.py): live
median/MAD from the count store equal the batch mad_outliers baselines
over the concatenated events (bitwise — median_from_counts ≡
percentile, pinned separately), online flagging judges a new batch
against PRIOR data only, unseen (key, hour) passes unflagged, replay
idempotence, compaction invisibility, and the bounded-store property."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.operators.stats import mad_outliers
from cassandra_iot_pipeline_spark.streaming.baselines import (
    BaselinePipeline,
)

SCHEMA = "user_id BIGINT, ts TIMESTAMP, value DOUBLE"


def _at(day: int, hour: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1 + day, hour, minute)


BATCHES = [
    [(1, _at(d, 9), 20.0 + 0.1 * d) for d in range(4)]
    + [(1, _at(d, 3), 5.0) for d in range(3)],
    [(1, _at(4, 9), 19.8), (2, _at(0, 9), 100.0), (2, _at(1, 9), 101.0)],
    [(1, _at(5, 9), 20.3), (2, _at(2, 9), 99.5)],
]


def _frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _all(spark):
    return _frame(spark, [r for b in BATCHES for r in b])


def _run(spark, tmp_path, compact_every=None):
    pipe = BaselinePipeline(
        str(tmp_path / "s"), compact_every=compact_every
    )
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    return pipe


def test_live_baselines_equal_batch_operator(spark, tmp_path):
    pipe = _run(spark, tmp_path)
    got = sorted(
        (r["k"], r["hod"], r["season_median"], r["season_mad"])
        for r in pipe.baselines(spark).collect()
    )
    want = sorted(
        set(
            (r["user_id"], r["hod"], r["season_median"], r["season_mad"])
            for r in mad_outliers(
                _all(spark), outliers_only=False
            ).collect()
        )
    )
    assert got == want


def test_flag_scores_against_prior_data_only(spark, tmp_path):
    pipe = _run(spark, tmp_path)
    # user 1 @ hour 9 baseline ~ 20; a wild 90 flags. The SAME wild
    # value for an unseen (key, hour) passes: nothing to deviate from.
    probe = _frame(
        spark,
        [
            (1, _at(9, 9), 90.0),
            (1, _at(9, 9, 30), 20.1),
            (77, _at(9, 9), 90.0),     # unseen key
            (1, _at(9, 15), 90.0),     # unseen hour for key 1
        ],
    )
    got = pipe.flag(spark, probe).collect()
    assert [(r["user_id"], r["value"]) for r in got] == [(1, 90.0)]
    allr = pipe.flag(spark, probe, outliers_only=False)
    assert allr.count() == 4
    assert allr.filter(F.col("is_outlier")).count() == 1


def test_replay_and_compaction_invisible(spark, tmp_path):
    pipe = _run(spark, tmp_path)
    before = sorted(tuple(r) for r in pipe.baselines(spark).collect())
    pipe.write_batch(_frame(spark, BATCHES[1]), epoch_id=1)  # replay
    assert sorted(tuple(r) for r in pipe.baselines(spark).collect()) == before
    assert pipe.compact(spark) == 2
    assert sorted(tuple(r) for r in pipe.baselines(spark).collect()) == before


def test_store_is_value_collapsed(spark, tmp_path):
    # 1000 identical readings collapse to ONE count row
    pipe = BaselinePipeline(str(tmp_path / "s"))
    rows = [(5, _at(0, 12, 0), 7.0)] * 1000 + [(5, _at(0, 12, 1), 8.0)]
    pipe.write_batch(_frame(spark, rows), epoch_id=0)
    c = pipe.counts(spark).collect()
    assert len(c) == 2
    assert {(r["u"], r["cnt"]) for r in c} == {(700, 1000), (800, 1)}


def test_string_key_lifecycle(spark, tmp_path):
    """A non-integral key (string device id) must work end-to-end when
    declared via key_type — the ADVICE r8 gap: the hardcoded BIGINT
    schema made read_store cast string keys to NULL, collapsing every
    key into one baseline group."""
    import pytest

    sch = "device STRING, ts TIMESTAMP, value DOUBLE"
    rows = [
        ("a", _at(d, 9), 20.0 + 0.1 * d) for d in range(4)
    ] + [("b", _at(d, 9), 100.0 + d) for d in range(4)]
    pipe = BaselinePipeline(
        str(tmp_path / "s"), key="device", key_type="STRING"
    )
    pipe.write_batch(spark.createDataFrame(rows[:5], sch), epoch_id=0)
    pipe.write_batch(spark.createDataFrame(rows[5:], sch), epoch_id=1)
    base = {
        (r["k"], r["hod"]): r["season_median"]
        for r in pipe.baselines(spark).collect()
    }
    # two distinct string keys, neither collapsed to NULL
    assert ("a", 9) in base and ("b", 9) in base
    assert None not in {k for k, _ in base}
    assert abs(base[("a", 9)] - 20.15) < 1e-9  # median of 20.0..20.3
    flagged = pipe.flag(
        spark,
        spark.createDataFrame([("a", _at(9, 9), 500.0)], sch),
        outliers_only=True,
    )
    assert flagged.count() == 1

    # undeclared mismatch fails LOUD at write time, not silently on read
    wrong = BaselinePipeline(str(tmp_path / "w"), key="device")
    with pytest.raises(TypeError, match="key_type"):
        wrong.write_batch(spark.createDataFrame(rows[:2], sch), epoch_id=0)


def test_rebuild_from_source_propagates_deletion(spark, tmp_path):
    """Deletion propagation for the count store (r8 verdict #6): after
    forgetting a key in the source, rebuild_from_source re-derives the
    store — baselines equal a from-scratch pipeline over the retained
    batches exactly, and the forgotten key has no baseline left."""
    import os

    pipe = _run(spark, tmp_path, compact_every=2)
    retained_rows = [
        (e,) + r for e, b in enumerate(BATCHES) for r in b if r[0] != 2
    ]
    retained = spark.createDataFrame(retained_rows, "epoch BIGINT, " + SCHEMA)
    report = pipe.rebuild_from_source(spark, retained)
    assert report["rows"] > 0 and report["epochs"] > 0

    fresh = BaselinePipeline(str(tmp_path / "f"))
    for e in range(len(BATCHES)):
        rows = [r[1:] for r in retained_rows if r[0] == e]
        if rows:
            fresh.write_batch(_frame(spark, rows), epoch_id=e)
    got = sorted(tuple(r) for r in pipe.baselines(spark).collect())
    want = sorted(tuple(r) for r in fresh.baselines(spark).collect())
    assert got == want
    assert not any(r[0] == 2 for r in got)  # forgotten key gone
    assert not any(
        n.startswith("base_upto=") for n in os.listdir(pipe.counts_dir)
    )
