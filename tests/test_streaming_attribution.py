"""Continuously-maintained attribution (streaming/attribution.py):
the live report is bitwise equal to the batch operator over the
concatenated events under randomized batch boundaries, a LATE touch
re-opens first-touch credit and re-shares linear credit (the
non-monotonicity that forces the on-read design), replay idempotence,
and compaction (full + tail) invisibility."""

from __future__ import annotations

import datetime as dt
import random

from cassandra_iot_pipeline_spark.operators.attribution import attribution
from cassandra_iot_pipeline_spark.store import compact_epochs
from cassandra_iot_pipeline_spark.streaming.attribution import (
    AttributionPipeline,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


ROWS = [
    (1, _t(0), 1, "view"),
    (2, _t(5), 1, "click"),
    (3, _t(7), 1, "view"),
    (4, _t(10), 1, "purchase"),
    (5, _t(40), 2, "click"),
    (6, _t(42), 2, "purchase"),
    (7, _t(20), 3, "view"),
    (8, _t(30), 3, "purchase"),
    (9, _t(55), 2, "error"),  # non-attribution type: filtered on write
]


def _frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _report(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_under_random_boundaries(spark, tmp_path):
    want = _report(
        attribution(_frame(spark, ROWS), "purchase", ("view", "click"), 600)
    )
    rng = random.Random(7)
    for trial in range(2):
        rows = ROWS[:]
        rng.shuffle(rows)
        cuts = sorted(rng.sample(range(1, len(rows)), 2))
        batches = [
            rows[: cuts[0]],
            rows[cuts[0] : cuts[1]],
            rows[cuts[1] :],
        ]
        pipe = AttributionPipeline(
            str(tmp_path / f"s{trial}"),
            "purchase",
            ("view", "click"),
            600,
            compact_every=2,
        )
        for i, b in enumerate(batches):
            pipe.write_batch(_frame(spark, b), epoch_id=i)
        assert _report(pipe.report(spark)) == want, trial
        # the non-attribution event type never lands in the store
        assert (
            pipe.points(spark).filter("t = 'error'").count() == 0
        )


def test_late_touch_reopens_credit(spark, tmp_path):
    """User 2's conversion is first attributed to its click; a LATE
    view BEFORE the click re-opens first-touch credit and re-shares
    linear credit — exactly the non-monotonicity the on-read design
    exists for."""
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )
    pipe.write_batch(_frame(spark, ROWS), epoch_id=0)
    before = {
        r["touch_type"]: (r["first_touch"], r["linear_units"])
        for r in pipe.report(spark).collect()
    }
    assert before["click"] == (1, 333333 + 1_000_000)
    pipe.write_batch(
        _frame(spark, [(10, _t(38), 2, "view")]), epoch_id=1
    )
    after = {
        r["touch_type"]: (r["first_touch"], r["linear_units"])
        for r in pipe.report(spark).collect()
    }
    # user 2's first touch flips to the late view; linear re-shares
    assert after["click"] == (0, 333333 + 500_000)
    assert after["view"][0] == before["view"][0] + 1


def test_replay_and_compactions_invisible(spark, tmp_path):
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )
    thirds = [ROWS[:3], ROWS[3:6], ROWS[6:]]
    for i, b in enumerate(thirds):
        pipe.write_batch(_frame(spark, b), epoch_id=i)
    before = _report(pipe.report(spark))
    pipe.write_batch(_frame(spark, thirds[1]), epoch_id=1)  # replay
    assert _report(pipe.report(spark)) == before
    # tail compaction (associative distinct fold), then the full fold
    assert compact_epochs(
        spark,
        pipe.pts_dir,
        spark.createDataFrame([], pipe.schema),
        fold=lambda df: df.distinct(),
        keep_recent=1,
    ) == 1
    assert _report(pipe.report(spark)) == before
    assert pipe.compact(spark) == 2
    assert _report(pipe.report(spark)) == before


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassandra_iot_pipeline_spark.streaming.attribution import (
        streaming_attribution,
    )

    src = tmp_path / "src"
    src.mkdir()
    thirds = [ROWS[:3], ROWS[3:6], ROWS[6:]]
    for i, rows in enumerate(thirds):
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_attribution(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        "purchase",
        ("view", "click"),
        600,
        compact_every=2,
    )
    q.awaitTermination()
    pipe = AttributionPipeline(
        str(tmp_path / "store"), "purchase", ("view", "click"), 600
    )
    want = _report(
        attribution(_frame(spark, ROWS), "purchase", ("view", "click"), 600)
    )
    assert _report(pipe.report(spark)) == want
