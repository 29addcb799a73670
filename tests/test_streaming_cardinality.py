"""Continuously-maintained distinct counts (streaming/cardinality.py):
streamed HLL estimates equal the one-pass batch estimates over the
concatenated events (same-engine exactness — the approx family refuses
a DuckDB oracle by contract), replay idempotence, compaction
invisibility, the standard-error bound vs exact distinct counts, the
fixture end-to-end, and the schema generalization guard."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.streaming.cardinality import (
    CardinalityPipeline,
    distinct_counts,
    period_index,
    streaming_cardinality,
)
from tests.conftest import SF_DIR

SCHEMA = "user_id BIGINT, event_type STRING, ts TIMESTAMP"
DAY = 86_400


def _day(n: int, hour: int = 12) -> dt.datetime:
    return dt.datetime(1970, 1, 1) + dt.timedelta(days=n, hours=hour)


BATCHES = [
    [(1, "view", _day(0)), (2, "view", _day(0)), (1, "view", _day(0, 20))],
    [(1, "buy", _day(0)), (3, "view", _day(1))],
    [(3, "view", _day(1, 23)), (4, "view", _day(1)), (2, "buy", _day(0))],
    [(5, "view", _day(0)), (1, "view", _day(1))],  # late back-fill to day 0
]


def _frame(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _all(spark):
    return _frame(spark, [r for b in BATCHES for r in b])


def _est(df):
    return sorted(tuple(r) for r in df.collect())


def _batch_estimates(spark):
    df = _all(spark).withColumn("pi", period_index("ts", DAY))
    return distinct_counts(df, ["event_type", "pi"], "user_id")


def test_epochs_equal_one_batch_pass(spark, tmp_path):
    pipe = CardinalityPipeline(
        str(tmp_path / "store"), period_seconds=DAY, compact_every=2
    )
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    assert _est(pipe.estimates(spark)) == _est(_batch_estimates(spark))


def test_small_group_estimates_are_exact(spark, tmp_path):
    # at these cardinalities HLL is exact; pin the actual counts so the
    # test fails loudly if grouping or the period floor ever drifts
    pipe = CardinalityPipeline(str(tmp_path / "store"), period_seconds=DAY)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    got = {
        (r["event_type"], r["pi"]): r["n_approx"]
        for r in pipe.estimates(spark).collect()
    }
    assert got == {
        ("view", 0): 3,  # users 1, 2, 5
        ("view", 1): 3,  # users 1, 3, 4
        ("buy", 0): 2,  # users 1, 2
    }


def test_replay_is_idempotent(spark, tmp_path):
    pipe = CardinalityPipeline(str(tmp_path / "store"), period_seconds=DAY)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    before = _est(pipe.estimates(spark))
    pipe.write_batch(_frame(spark, BATCHES[2]), epoch_id=2)  # replay
    assert _est(pipe.estimates(spark)) == before


def test_compaction_is_estimate_invisible(spark, tmp_path):
    pipe = CardinalityPipeline(str(tmp_path / "store"), period_seconds=DAY)
    for i, rows in enumerate(BATCHES[:3]):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    pre = _est(pipe.estimates(spark))
    assert pipe.compact(spark) == 2
    assert _est(pipe.estimates(spark)) == pre
    # post-compaction ingest keeps merging correctly
    pipe.write_batch(_frame(spark, BATCHES[3]), epoch_id=3)
    assert _est(pipe.estimates(spark)) == _est(_batch_estimates(spark))


def test_fixture_error_bound(spark, tmp_path):
    # split the fixture into 3 epochs; estimates must track exact
    # distinct counts within 5 sigma of the lg_k=12 rsd (~1.6 %)
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    )
    parts = events.randomSplit([1.0, 1.0, 1.0], seed=7)
    pipe = CardinalityPipeline(
        str(tmp_path / "store"), period_seconds=None
    )
    for i, part in enumerate(parts):
        pipe.write_batch(part, epoch_id=i)
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r["event_type"]: r["n_approx"]
        for r in pipe.estimates(spark).collect()
    }
    assert set(got) == set(exact)
    rsd = 1.04 / (2**12) ** 0.5
    for et, n in exact.items():
        assert abs(got[et] - n) <= max(2, 5 * rsd * n), (et, got[et], n)


def test_streamed_equals_batch_on_fixture(spark, tmp_path):
    # the full same-engine parity: streamed store estimates == one-pass
    # batch estimates over the identical rows (merge-invariance)
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    )
    parts = events.randomSplit([1.0, 1.0], seed=11)
    pipe = CardinalityPipeline(str(tmp_path / "store"), period_seconds=DAY)
    for i, part in enumerate(parts):
        pipe.write_batch(part, epoch_id=i)
    want = distinct_counts(
        events.withColumn("pi", period_index("ts", DAY)),
        ["event_type", "pi"],
        "user_id",
    )
    assert _est(pipe.estimates(spark)) == _est(want)


def test_schema_generalization_and_guard(spark, tmp_path):
    schema = "device_code STRING, kind STRING, ts TIMESTAMP"
    rows = [
        ("a", "x", _day(0)),
        ("b", "x", _day(0)),
        ("a", "y", _day(1)),
    ]
    pipe = CardinalityPipeline(
        str(tmp_path / "store"),
        group_cols=("kind",),
        value_col="device_code",
        period_seconds=DAY,
        updates_schema=schema,
    )
    pipe.write_batch(_frame(spark, rows, schema), epoch_id=0)
    got = {
        (r["kind"], r["pi"]): r["n_approx"]
        for r in pipe.estimates(spark).collect()
    }
    assert got == {("x", 0): 2, ("y", 1): 1}
    with pytest.raises(ValueError, match="absent from events schema"):
        CardinalityPipeline(
            str(tmp_path / "s2"),
            group_cols=("nope",),
            updates_schema=schema,
        )


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        table = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_cardinality(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        period_seconds=DAY,
        compact_every=2,
    )
    q.awaitTermination()
    pipe = CardinalityPipeline(str(tmp_path / "store"), period_seconds=DAY)
    assert _est(pipe.estimates(spark)) == _est(_batch_estimates(spark))


def test_rebuild_from_source_propagates_deletion(spark, tmp_path):
    """The executable form of the sketch-store deletion limit (r8
    verdict #6): forget a key in the source, rebuild the store from
    the retained+epoch-annotated corpus — estimates equal a
    from-scratch pipeline over the retained batches exactly (HLL is
    deterministic), the forgotten key's contribution is gone, and any
    pre-deletion compacted base is dropped."""
    pipe = CardinalityPipeline(str(tmp_path / "s"), compact_every=2)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    before = {
        (r["event_type"], r["pi"]): r["n_approx"]
        for r in pipe.estimates(spark).collect()
    }

    # retained corpus: user 1 forgotten, rows annotated with their epoch
    retained_rows = [
        (e,) + r for e, b in enumerate(BATCHES) for r in b if r[0] != 1
    ]
    retained = spark.createDataFrame(retained_rows, "epoch BIGINT, " + SCHEMA)
    report = pipe.rebuild_from_source(spark, retained)
    assert report["rows"] > 0 and report["epochs"] > 0

    fresh = CardinalityPipeline(str(tmp_path / "f"))
    for e in range(len(BATCHES)):
        rows = [r for r in retained_rows if r[0] == e]
        if rows:
            fresh.write_batch(
                spark.createDataFrame(rows, "epoch BIGINT, " + SCHEMA).drop(
                    "epoch"
                ),
                epoch_id=e,
            )
    got = sorted(tuple(r) for r in pipe.estimates(spark).collect())
    want = sorted(tuple(r) for r in fresh.estimates(spark).collect())
    assert got == want
    after = {
        (r["event_type"], r["pi"]): r["n_approx"]
        for r in pipe.estimates(spark).collect()
    }
    # user 1 was the only 'buy' on day 0 besides user 2 — count drops
    assert after[("buy", 0)] < before[("buy", 0)]
    # no stale base survives the swap (the base folded forgotten data)
    assert not any(
        n.startswith("base_upto=") for n in os.listdir(pipe.sk_dir)
    )


def test_rolling_estimates_match_one_shot_windows(spark, tmp_path):
    """Sliding distinct counts from the sketch store: each trailing
    window's estimate equals the one-shot HLL estimate over that
    window's raw events (union is exactly sliding set union —
    merge-invariant), windows only serve at observed end periods, and
    the guards fire."""
    pipe = CardinalityPipeline(str(tmp_path / "s"), period_seconds=DAY)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    w = 2
    got = {
        (r["event_type"], r["pi"]): r["n_approx"]
        for r in pipe.rolling_estimates(spark, w).collect()
    }
    all_events = _all(spark).withColumn("pi", period_index("ts", DAY))
    observed = {
        (r["event_type"], r["pi"])
        for r in all_events.select("event_type", "pi").distinct().collect()
    }
    assert set(got) == observed
    for (et, pi), est in got.items():
        want = (
            distinct_counts(
                all_events.filter(
                    (F.col("event_type") == et)
                    & (F.col("pi") >= pi - (w - 1))
                    & (F.col("pi") <= pi)
                ),
                ["event_type"],
                "user_id",
            ).collect()[0]["n_approx"]
        )
        assert est == want, (et, pi)

    import pytest

    with pytest.raises(ValueError, match="window_periods"):
        pipe.rolling_estimates(spark, 0)
    flat = CardinalityPipeline(str(tmp_path / "f"), period_seconds=None)
    flat.write_batch(_frame(spark, BATCHES[0]), epoch_id=0)
    with pytest.raises(ValueError, match="period-indexed"):
        flat.rolling_estimates(spark, 2)
