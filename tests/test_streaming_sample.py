"""Continuously-maintained weighted sample (streaming/sample.py):
streamed reservoir ≡ batch priority_sample over the concatenated
key-deduped input, cross-epoch re-delivery collapses exactly (the
hash-pure priority property), changed-weight dedup rule, replay
idempotence, compaction invisibility + bounded store, and the wrapper
e2e."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.functions.sampling import priority_sample
from cassandra_iot_pipeline_spark.streaming.sample import (
    PrioritySamplePipeline,
    streaming_priority_sample,
)

SCHEMA = "event_id BIGINT, value DOUBLE, g BIGINT"

BATCHES = [
    [(i, float(1 + (i * 7) % 13), i % 2) for i in range(0, 15)],
    [(i, float(1 + (i * 7) % 13), i % 2) for i in range(15, 30)],
    # cross-epoch re-delivery of ids 10-14 with IDENTICAL weights
    [(i, float(1 + (i * 7) % 13), i % 2) for i in range(10, 20)]
    + [(i, float(1 + (i * 7) % 13), i % 2) for i in range(30, 40)],
]

K = 6


def _frame(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _all_distinct(spark):
    seen = {}
    for b in BATCHES:
        for r in b:
            seen[r[0]] = r
    return _frame(spark, sorted(seen.values()))


def _s(df):
    return sorted(tuple(r) for r in df.collect())


def _want(spark, group=None):
    return priority_sample(
        _all_distinct(spark), "event_id", "value", K, group=group
    )


def test_epochs_equal_one_batch_sample(spark, tmp_path):
    pipe = PrioritySamplePipeline(str(tmp_path / "s"), K, group="g")
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    got = pipe.sample(spark).select("event_id", "value", "g", "est_w")
    want = _want(spark, group="g").select(
        "event_id", "value", "g", "est_w"
    )
    assert _s(got) == _s(want)


def test_global_form_and_redelivery_collapse(spark, tmp_path):
    pipe = PrioritySamplePipeline(str(tmp_path / "s"), K)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    got = pipe.sample(spark)
    assert got.count() == K
    # no key appears twice despite ids 10-19 delivered in two epochs
    assert got.select("event_id").distinct().count() == K
    want = _want(spark).select("event_id", "value", "est_w")
    assert _s(got.select("event_id", "value", "est_w")) == _s(want)


def test_replay_is_idempotent(spark, tmp_path):
    pipe = PrioritySamplePipeline(str(tmp_path / "s"), K, group="g")
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    before = _s(pipe.sample(spark))
    pipe.write_batch(_frame(spark, BATCHES[0]), epoch_id=0)  # replay
    assert _s(pipe.sample(spark)) == before


def test_changed_weight_larger_priority_wins(spark, tmp_path):
    pipe = PrioritySamplePipeline(str(tmp_path / "s"), 3)
    pipe.write_batch(
        _frame(spark, [(1, 2.0, 0), (2, 3.0, 0)]), epoch_id=0
    )
    pipe.write_batch(
        _frame(spark, [(1, 50.0, 0), (3, 1.0, 0)]), epoch_id=1
    )
    got = {r["event_id"]: r["value"] for r in pipe.sample(spark).collect()}
    assert got[1] == 50.0  # the larger-weight (larger-priority) version


def test_compaction_invisible_and_store_bounded(spark, tmp_path):
    pipe = PrioritySamplePipeline(str(tmp_path / "s"), K, group="g")
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    pre = _s(pipe.sample(spark))
    assert pipe.compact(spark) == 2
    assert _s(pipe.sample(spark)) == pre
    # compacted base holds at most k+1 rows per group
    base = spark.read.parquet(str(tmp_path / "s/res/base_upto=2"))
    per_group = base.groupBy("g").count().collect()
    assert all(r["count"] <= K + 1 for r in per_group)
    # post-compaction ingest keeps folding
    extra = [(100, 99.0, 0), (101, 99.0, 1)]
    pipe.write_batch(_frame(spark, extra), epoch_id=3)
    allrows = _all_distinct(spark).union(_frame(spark, extra))
    want = priority_sample(allrows, "event_id", "value", K, group="g")
    assert _s(
        pipe.sample(spark).select("event_id", "value", "g", "est_w")
    ) == _s(want.select("event_id", "value", "g", "est_w"))


def test_schema_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="absent from events schema"):
        PrioritySamplePipeline(
            str(tmp_path / "s"), K, key="nope", updates_schema=SCHEMA
        )


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "value": pa.array([r[1] for r in rows], pa.float64()),
                "g": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_priority_sample(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        K,
        group="g",
        compact_every=2,
    )
    q.awaitTermination()
    pipe = PrioritySamplePipeline(str(tmp_path / "store"), K, group="g")
    want = _want(spark, group="g").select("event_id", "value", "g", "est_w")
    assert _s(
        pipe.sample(spark).select("event_id", "value", "g", "est_w")
    ) == _s(want)
