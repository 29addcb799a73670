"""Continuously-maintained score distribution (streaming/quality.py):
the streamed threshold equals the batch score_thresholds over the
concatenated rows at the same grid, replay is idempotent, compaction
is reader-invisible, and the distribution stays grid-bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.functions.sampling import (
    score_thresholds,
)
from cassandra_iot_pipeline_spark.streaming.quality import (
    ScoreDistPipeline,
)

SCHEMA = "doc_id BIGINT, quality_score DOUBLE"


def _frame(spark, lo, n):
    # continuous, deterministic scores
    return spark.createDataFrame(
        [(i, 1.0 / (i + 3)) for i in range(lo, lo + n)], SCHEMA
    )


def _thr(df):
    return [tuple(r) for r in df.collect()]


def test_epochs_equal_one_batch_threshold(spark, tmp_path):
    pipe = ScoreDistPipeline(
        str(tmp_path / "store"), quantize_decimals=4, compact_every=2
    )
    batches = [_frame(spark, 0, 200), _frame(spark, 200, 300),
               _frame(spark, 500, 100)]
    for i, b in enumerate(batches):
        pipe.write_batch(b, epoch_id=i)
    all_rows = batches[0]
    for b in batches[1:]:
        all_rows = all_rows.unionByName(b)
    for frac in (0.1, 0.5, 1.0):
        want = _thr(
            score_thresholds(
                all_rows, "quality_score", frac, quantize_decimals=4
            ).select("n_rows", "k_target", "threshold")
        )
        got = _thr(pipe.threshold(spark, frac))
        assert got == want, frac


def test_replay_idempotent_and_grid_bounded(spark, tmp_path):
    pipe = ScoreDistPipeline(str(tmp_path / "store"), quantize_decimals=2)
    pipe.write_batch(_frame(spark, 0, 500), epoch_id=0)
    pipe.write_batch(_frame(spark, 500, 500), epoch_id=1)
    before = _thr(pipe.threshold(spark, 0.25))
    n_dist = pipe.distribution(spark).count()
    pipe.write_batch(_frame(spark, 500, 500), epoch_id=1)  # replay
    assert _thr(pipe.threshold(spark, 0.25)) == before
    assert pipe.distribution(spark).count() == n_dist
    # grid-bounded: scores are in (0, 1/3], 2 decimals -> <= 35 cells
    assert n_dist <= 35
    # NULL scores never land
    pipe.write_batch(
        spark.createDataFrame([(9999, None)], SCHEMA), epoch_id=2
    )
    assert pipe.distribution(spark).count() == n_dist


def test_compaction_is_reader_invisible(spark, tmp_path):
    pipe = ScoreDistPipeline(str(tmp_path / "store"), quantize_decimals=4)
    pipe.write_batch(_frame(spark, 0, 300), epoch_id=0)
    pipe.write_batch(_frame(spark, 300, 300), epoch_id=1)
    pre_thr = _thr(pipe.threshold(spark, 0.2))
    pre_dist = sorted(tuple(r) for r in pipe.distribution(spark).collect())
    assert pipe.compact(spark) == 1
    assert _thr(pipe.threshold(spark, 0.2)) == pre_thr
    assert sorted(
        tuple(r) for r in pipe.distribution(spark).collect()
    ) == pre_dist
    # maintenance continues identically on top of the base
    pipe.write_batch(_frame(spark, 600, 100), epoch_id=2)
    want = _thr(
        score_thresholds(
            _frame(spark, 0, 700), "quality_score", 0.2,
            quantize_decimals=4,
        ).select("n_rows", "k_target", "threshold")
    )
    assert _thr(pipe.threshold(spark, 0.2)) == want
