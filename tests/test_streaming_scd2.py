"""Continuously-maintained SCD2 dimension (streaming/scd2.py):
epoch-by-epoch maintenance equals one batch snapshot over the
concatenated log, replays are idempotent, compaction is
reader-invisible, and the foreachBatch wiring plus point-in-time
enrichment work end-to-end."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.operators.scd2 import (
    scd2_enrich,
    scd2_snapshot,
)
from cassandra_iot_pipeline_spark.streaming.scd2 import (
    Scd2Pipeline,
    streaming_scd2,
)

SCHEMA = "user_id BIGINT, ts TIMESTAMP, seg STRING"


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _log(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


BATCHES = [
    [(1, _ts(0), "a"), (2, _ts(1), "x")],
    [(1, _ts(2), "a"), (1, _ts(4), "b"), (3, _ts(3), "q")],  # no-op + change
    [(2, _ts(6), "y"), (1, _ts(8), "a")],                     # re-open
]


def _dim_rows(pipe, spark):
    return sorted(tuple(r) for r in pipe.dimension(spark).collect())


def test_epochs_equal_one_snapshot(spark, tmp_path):
    pipe = Scd2Pipeline(str(tmp_path / "store"), "user_id", ("seg",), "ts")
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_log(spark, rows), epoch_id=i)
    want = sorted(
        tuple(r)
        for r in scd2_snapshot(
            _log(spark, [r for b in BATCHES for r in b]),
            "user_id", ("seg",), "ts",
        ).collect()
    )
    assert _dim_rows(pipe, spark) == want
    assert len(want) >= 5  # the log really produced version history


def test_replay_is_idempotent(spark, tmp_path):
    pipe = Scd2Pipeline(str(tmp_path / "store"), "user_id", ("seg",), "ts")
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_log(spark, rows), epoch_id=i)
    before = _dim_rows(pipe, spark)
    pipe.write_batch(_log(spark, BATCHES[1]), epoch_id=1)  # replay mid-epoch
    assert _dim_rows(pipe, spark) == before


def test_compaction_is_reader_invisible(spark, tmp_path):
    pipe = Scd2Pipeline(str(tmp_path / "store"), "user_id", ("seg",), "ts")
    for i, rows in enumerate(BATCHES[:2]):
        pipe.write_batch(_log(spark, rows), epoch_id=i)
    pre = _dim_rows(pipe, spark)
    assert pipe.compact(spark) == 1
    assert _dim_rows(pipe, spark) == pre
    # and maintenance continues on top of the base identically
    pipe.write_batch(_log(spark, BATCHES[2]), epoch_id=2)
    want = sorted(
        tuple(r)
        for r in scd2_snapshot(
            _log(spark, [r for b in BATCHES for r in b]),
            "user_id", ("seg",), "ts",
        ).collect()
    )
    assert _dim_rows(pipe, spark) == want


def test_streaming_wrapper_and_enrich(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        table = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "seg": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_scd2(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        key="user_id",
        attrs=("seg",),
        compact_every=2,
    )
    q.awaitTermination()
    pipe = Scd2Pipeline(str(tmp_path / "store"), "user_id", ("seg",), "ts")
    want = sorted(
        tuple(r)
        for r in scd2_snapshot(
            _log(spark, [r for b in BATCHES for r in b]),
            "user_id", ("seg",), "ts",
        ).collect()
    )
    assert _dim_rows(pipe, spark) == want
    # point-in-time enrichment against the streamed store: key 1 was
    # "a" at minute 3 (before the minute-4 change to "b"), "b" at 5,
    # and "a" again at 9 after the re-open
    facts = spark.createDataFrame(
        [(100, 1, _ts(3)), (101, 1, _ts(5)), (102, 1, _ts(9))],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP",
    )
    got = {
        r["event_id"]: r["seg"]
        for r in scd2_enrich(
            facts, pipe.dimension(spark), "user_id", "ts", ("seg",)
        ).collect()
    }
    assert got == {100: "a", 101: "b", 102: "a"}


def test_stream_enrich_matches_batch_and_sees_live_dimension(spark, tmp_path):
    """scd2_enrich_stream: (a) over a fixed dimension, the streamed
    enrichment equals the batch scd2_enrich row for row; (b) the
    static side re-reads the store each micro-batch, so a dimension
    update written BETWEEN triggers is visible to the next batch
    without restarting the query."""
    from cassandra_iot_pipeline_spark.streaming.scd2 import (
        scd2_enrich_stream,
    )

    store = str(tmp_path / "store")
    pipe = Scd2Pipeline(store, "user_id", ("seg",), "ts")
    pipe.write_batch(
        _log(spark, [(1, _ts(0), "a"), (1, _ts(10), "b")]), epoch_id=0
    )

    facts_schema = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"
    src = tmp_path / "facts"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        q = (
            scd2_enrich_stream(
                spark.readStream.schema(facts_schema).parquet(
                    str(src) + "/*"
                ),
                pipe.dimension(spark),
                "user_id",
                "ts",
                ("seg",),
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch1 = [(100, 1, _ts(5)), (101, 1, _ts(11)), (102, 2, _ts(5))]
    spark.createDataFrame(batch1, facts_schema).write.parquet(
        str(src / "b0")
    )
    run_stream()
    got = {
        r["event_id"]: r["seg"]
        for r in spark.read.parquet(sink).collect()
    }
    # batch parity on the fixed dimension (key 2 unknown -> NULL)
    from cassandra_iot_pipeline_spark.operators.scd2 import scd2_enrich

    want = {
        r["event_id"]: r["seg"]
        for r in scd2_enrich(
            spark.createDataFrame(batch1, facts_schema),
            pipe.dimension(spark),
            "user_id", "ts", ("seg",),
        ).collect()
    }
    assert got == want == {100: "a", 101: "b", 102: None}

    # live refresh: key 2 gains history; a new facts file processed by
    # the SAME sink/checkpoint sees it
    pipe.write_batch(_log(spark, [(2, _ts(0), "x")]), epoch_id=1)
    spark.createDataFrame(
        [(103, 2, _ts(5))], facts_schema
    ).write.parquet(str(src / "b1"))
    run_stream()
    got = {
        r["event_id"]: r["seg"]
        for r in spark.read.parquet(sink).collect()
    }
    assert got[103] == "x" and got[102] is None  # old row not rewritten


def test_write_path_prunes_store_below_winner_window(spark, tmp_path):
    """r7 verdict #1: the write path's touched-key semi-join must sit
    BELOW the winner-rule window's exchange (prune first, window over
    batch-proportional rows), and pruning must be bit-identical to
    windowing the full store then filtering (the winner rule is
    per-key independent)."""
    pipe = Scd2Pipeline(str(tmp_path / "store"), "user_id", ("seg",), "ts")
    for i, rows in enumerate(BATCHES[:2]):
        pipe.write_batch(_log(spark, rows), epoch_id=i)
    batch = _log(spark, BATCHES[2])
    touched = F.broadcast(batch.select("user_id").distinct())
    current = pipe._winner_rows(
        pipe._raw_before(spark, 2).join(touched, ["user_id"], "semi")
    ).drop("epoch")
    current.collect()
    plan = current._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "LeftSemi" in final
    # tree prints parents first: Window above the semi-join means the
    # prune executes below it — the window never sees untouched keys
    assert final.index("Window") < final.index("LeftSemi")
    # equivalence: pruned-then-windowed == windowed-then-filtered
    full = pipe._dim_before(spark, 2).join(touched, ["user_id"], "semi")
    assert sorted(tuple(r) for r in current.collect()) == sorted(
        tuple(r) for r in full.collect()
    )


def test_generalized_schema_lifecycle(spark, tmp_path):
    """r7 verdict #5: key/attr types derive from the caller's update
    schema — a STRING-keyed dimension with a non-string attr runs the
    full epoch/replay/compact lifecycle (the hardcoded BIGINT/STRING
    shape made epoch 0's empty store unjoinable against such keys)."""
    schema2 = "device_code STRING, ts TIMESTAMP, fw INT, region STRING"
    batches = [
        [("a1", _ts(0), 1, "eu"), ("b2", _ts(1), 3, "us")],
        [("a1", _ts(2), 1, "eu"), ("a1", _ts(4), 2, "eu")],  # no-op + change
        [("b2", _ts(6), 3, "ap"), ("a1", _ts(8), 1, "eu")],  # re-open
    ]
    pipe = Scd2Pipeline(
        str(tmp_path / "store"),
        "device_code",
        ("fw", "region"),
        "ts",
        updates_schema=schema2,
    )
    for i, rows in enumerate(batches):
        pipe.write_batch(spark.createDataFrame(rows, schema2), epoch_id=i)
    want = sorted(
        tuple(r)
        for r in scd2_snapshot(
            spark.createDataFrame(
                [r for b in batches for r in b], schema2
            ),
            "device_code",
            ("fw", "region"),
            "ts",
        ).collect()
    )
    assert _dim_rows(pipe, spark) == want
    assert len(want) >= 4
    # attr type survived the store roundtrip (not stringified)
    assert dict(pipe.dimension(spark).dtypes)["fw"] == "int"
    # replay + compaction keep the invariants on the generalized shape
    pipe.write_batch(spark.createDataFrame(batches[1], schema2), epoch_id=1)
    assert _dim_rows(pipe, spark) == want
    pipe.compact(spark)
    assert _dim_rows(pipe, spark) == want


def test_schema_missing_column_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="absent from updates schema"):
        Scd2Pipeline(
            str(tmp_path / "store"),
            "device_code",
            ("missing_attr",),
            "ts",
            updates_schema="device_code STRING, ts TIMESTAMP",
        )
