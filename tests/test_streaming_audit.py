"""Continuous data-quality auditing (streaming/audit.py): per-epoch
reports equal the batch operator on each batch, a planted null flood
surfaces at exactly its epoch, replay is idempotent, compaction is
reader-invisible, and the foreachBatch wiring runs end-to-end."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_iot_pipeline_spark.functions import expectations as X
from cassandra_iot_pipeline_spark.streaming.audit import (
    AuditPipeline,
    streaming_audit,
)

SCHEMA = "id BIGINT, cat STRING"
CHECKS = [
    X.Completeness("id", min_frac=0.9),
    X.AcceptedValues("cat", ("a", "b")),
]

BATCHES = [
    [(1, "a"), (2, "b"), (3, "a")],                      # clean
    [(None, "a"), (None, "b"), (4, "a"), (5, "b")],      # null flood
    [(6, "zz"), (7, "a")],                               # bad category
]


def _frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _hist(pipe, spark):
    return {
        (r["epoch"], r["check_name"]): (r["metric"], r["passed"])
        for r in pipe.history(spark).collect()
    }


def test_per_epoch_reports_match_batch_operator(spark, tmp_path):
    pipe = AuditPipeline(str(tmp_path / "store"), CHECKS, compact_every=2)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    got = _hist(pipe, spark)
    for i, rows in enumerate(BATCHES):
        want = {
            r["check_name"]: (r["metric"], r["passed"])
            for r in X.expectations_report(
                _frame(spark, rows), CHECKS
            ).collect()
        }
        for name, mv in want.items():
            assert got[(i, name)] == mv, (i, name)


def test_drift_surfaces_at_its_epoch(spark, tmp_path):
    pipe = AuditPipeline(str(tmp_path / "store"), CHECKS)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    got = _hist(pipe, spark)
    assert got[(0, "completeness(id)")] == (1.0, True)
    assert got[(1, "completeness(id)")] == (0.5, False)   # the flood
    assert got[(2, "completeness(id)")] == (1.0, True)
    fails = {
        (r["epoch"], r["check_name"])
        for r in pipe.failures(spark).collect()
    }
    assert fails == {
        (1, "completeness(id)"),
        (2, "accepted_values(cat)"),
    }


def test_replay_idempotent_and_compaction_invisible(spark, tmp_path):
    pipe = AuditPipeline(str(tmp_path / "store"), CHECKS)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    before = _hist(pipe, spark)
    pipe.write_batch(_frame(spark, BATCHES[1]), epoch_id=1)  # replay
    assert _hist(pipe, spark) == before
    assert pipe.compact(spark) == 2
    assert _hist(pipe, spark) == before


def test_rejects_empty_checks(tmp_path):
    with pytest.raises(ValueError):
        AuditPipeline(str(tmp_path / "s"), [])


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        table = pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "cat": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_audit(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        CHECKS,
        compact_every=2,
    )
    q.awaitTermination()
    pipe = AuditPipeline(str(tmp_path / "store"), CHECKS)
    got = _hist(pipe, spark)
    assert got[(1, "completeness(id)")] == (0.5, False)
    assert len(got) == len(BATCHES) * len(CHECKS)
