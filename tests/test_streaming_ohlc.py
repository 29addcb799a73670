"""Continuously-maintained OHLC candles (streaming/ohlc.py): the
order-statistic fold is associative, so streamed bars are BITWISE
equal to one batch ohlc_bars over the concatenated events — pinned
epoch-by-epoch, across replay, compaction, arbitrary batch boundaries
(randomized), the schema generalization guard, and the wrapper e2e."""

from __future__ import annotations

import datetime as dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.timeseries import ohlc_bars
from cassandra_iot_pipeline_spark.streaming.ohlc import (
    OhlcPipeline,
    streaming_ohlc,
)
from tests.conftest import SF_DIR

SCHEMA = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE"


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, minute // 60, minute % 60, second)


BATCHES = [
    [(1, 7, _t(5), 10.0), (2, 7, _t(20), 50.0), (3, 8, _t(1), 4.0)],
    [(4, 7, _t(40), 5.0), (5, 7, _t(59), 30.0)],
    # late data for an hour the first epochs already opened: the new
    # event carries the smallest ordkey, so it REPLACES the open
    [(6, 7, _t(0), 77.0), (7, 7, _t(70), 1.0)],
]


def _frame(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _all(spark):
    return _frame(spark, [r for b in BATCHES for r in b])


def _bars(df):
    return sorted(tuple(r) for r in df.collect())


def test_epochs_equal_one_batch_and_late_open_replaced(spark, tmp_path):
    pipe = OhlcPipeline(str(tmp_path / "store"))
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    assert _bars(pipe.bars(spark)) == _bars(ohlc_bars(_all(spark)))
    h0 = next(
        r
        for r in pipe.bars(spark).collect()
        if r["user_id"] == 7 and r["bucket_s"] == 1709251200
    )
    assert (h0["open"], h0["close"], h0["n_events"]) == (77.0, 30.0, 5)


def test_replay_is_idempotent(spark, tmp_path):
    pipe = OhlcPipeline(str(tmp_path / "store"))
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    before = _bars(pipe.bars(spark))
    pipe.write_batch(_frame(spark, BATCHES[1]), epoch_id=1)  # replay
    assert _bars(pipe.bars(spark)) == before


def test_compaction_is_reader_invisible(spark, tmp_path):
    pipe = OhlcPipeline(str(tmp_path / "store"))
    for i, rows in enumerate(BATCHES[:2]):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    pre = _bars(pipe.bars(spark))
    assert pipe.compact(spark) == 1
    assert _bars(pipe.bars(spark)) == pre
    pipe.write_batch(_frame(spark, BATCHES[2]), epoch_id=2)
    assert _bars(pipe.bars(spark)) == _bars(ohlc_bars(_all(spark)))


def test_randomized_batch_boundaries_on_fixture(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    rows = events.collect()
    rng = random.Random(13)
    rng.shuffle(rows)
    cuts = sorted(rng.sample(range(1, len(rows)), 3))
    parts = [
        rows[a:b] for a, b in zip([0, *cuts], [*cuts, len(rows)])
    ]
    pipe = OhlcPipeline(str(tmp_path / "store"), compact_every=2)
    for i, part in enumerate(parts):
        pipe.write_batch(_frame(spark, part), epoch_id=i)
    assert _bars(pipe.bars(spark)) == _bars(ohlc_bars(events))


def test_schema_generalization_and_guard(spark, tmp_path):
    schema = "seq BIGINT, device STRING, ts TIMESTAMP, value DOUBLE"
    rows = [(1, "a", _t(0), 2.0), (2, "a", _t(1), 9.0), (3, "b", _t(2), 4.0)]
    pipe = OhlcPipeline(
        str(tmp_path / "store"),
        key="device",
        id_col="seq",
        updates_schema=schema,
    )
    pipe.write_batch(_frame(spark, rows, schema), epoch_id=0)
    want = ohlc_bars(
        _frame(spark, rows, schema), key="device", id_col="seq"
    )
    assert _bars(pipe.bars(spark)) == _bars(want)
    with pytest.raises(ValueError, match="absent from events schema"):
        OhlcPipeline(
            str(tmp_path / "s2"), key="nope", updates_schema=schema
        )


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_ohlc(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        compact_every=2,
    )
    q.awaitTermination()
    pipe = OhlcPipeline(str(tmp_path / "store"))
    assert _bars(pipe.bars(spark)) == _bars(ohlc_bars(_all(spark)))
