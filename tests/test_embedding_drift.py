"""Continuous embedding-drift monitoring (streaming/embedding_drift
.py): per-epoch reports equal a direct exact-tier assignment of the
same batch, a planted distribution shift alerts at exactly its epoch,
in-distribution epochs stay quiet, replay idempotence, and compaction
invisibility."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.functions.similarity import (
    _centroid_ranked,
)
from cassandra_iot_pipeline_spark.streaming.embedding_drift import (
    EmbeddingDriftPipeline,
)

DIMS = 8


def _vec(axis: int, i: int) -> list[float]:
    """A unit-ish vector near basis axis ``axis`` with a small
    deterministic wobble."""
    v = [0.05 * math.cos(i * 1.7 + d) for d in range(DIMS)]
    v[axis] += 1.0
    return [round(x, 4) for x in v]


def _frame(spark, rows):
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def _centroids(spark):
    # a frozen 3-list codebook: axes 0, 1, 2
    rows = [(100 + a, [1.0 if d == a else 0.0 for d in range(DIMS)]) for a in range(3)]
    return _frame(spark, rows)


def _batch(axis_mix: list[int], start: int) -> list[tuple]:
    return [(start + i, _vec(a, i)) for i, a in enumerate(axis_mix)]


BASE_MIX = [0, 0, 1, 1, 2, 2]  # balanced over the codebook


def test_epoch_report_equals_direct_assignment(spark, tmp_path):
    cents = _centroids(spark)
    pipe = EmbeddingDriftPipeline(str(tmp_path / "s"), cents)
    batch = _frame(spark, _batch(BASE_MIX, 0))
    pipe.write_batch(batch, epoch_id=0)
    got = {
        (r["lst"], r["n"]) for r in pipe.history(spark).collect()
    }
    want = (
        _centroid_ranked(batch, cents)
        .filter(F.col("crank") == 1)
        .groupBy("cent_vid")
        .count()
        .collect()
    )
    assert got == {(r["cent_vid"], r["count"]) for r in want}
    assert {r[0] for r in got} == {100, 101, 102}


def test_drift_alert_fires_at_shift_epoch(spark, tmp_path):
    cents = _centroids(spark)
    pipe = EmbeddingDriftPipeline(str(tmp_path / "s"), cents)
    pipe.write_batch(_frame(spark, _batch(BASE_MIX, 0)), epoch_id=0)
    pipe.write_batch(_frame(spark, _batch(BASE_MIX, 100)), epoch_id=1)
    # epoch 2: everything collapses onto axis 0 (encoder change /
    # new modality) — occupancy share of list 100 doubles
    pipe.write_batch(
        _frame(spark, _batch([0] * 6, 200)), epoch_id=2
    )
    got = {
        r["epoch"]: r["drifted"]
        for r in pipe.drift(spark).collect()
    }
    assert got == {0: False, 1: False, 2: True}
    row2 = [r for r in pipe.drift(spark).collect() if r["epoch"] == 2][0]
    assert row2["max_share_delta"] > 0.5


def test_residual_distance_drift_without_share_change(spark, tmp_path):
    cents = _centroids(spark)
    pipe = EmbeddingDriftPipeline(str(tmp_path / "s"), cents)
    pipe.write_batch(_frame(spark, _batch(BASE_MIX, 0)), epoch_id=0)
    # same occupancy mix, but vectors pushed far off-axis (diagonal
    # between the own axis and the next): shares hold, residuals rise
    far = [
        (300 + i, [0.8 if d == a else (0.6 if d == (a + 1) % 3 else 0.0) for d in range(DIMS)])
        for i, a in enumerate(BASE_MIX)
    ]
    pipe.write_batch(_frame(spark, far), epoch_id=1)
    rows = {r["epoch"]: r for r in pipe.drift(spark).collect()}
    assert rows[1]["max_share_delta"] < 0.01
    assert rows[1]["drifted"]  # caught by the distance term
    assert rows[1]["mean_dist"] > rows[1]["baseline_mean_dist"] + 0.05


def test_replay_and_compaction_invisible(spark, tmp_path):
    cents = _centroids(spark)
    pipe = EmbeddingDriftPipeline(str(tmp_path / "s"), cents)
    for e in range(3):
        pipe.write_batch(
            _frame(spark, _batch(BASE_MIX, 100 * e)), epoch_id=e
        )
    before = sorted(tuple(r) for r in pipe.history(spark).collect())
    pipe.write_batch(
        _frame(spark, _batch(BASE_MIX, 100)), epoch_id=1
    )  # replay
    assert sorted(tuple(r) for r in pipe.history(spark).collect()) == before
    assert pipe.compact(spark) == 2
    assert sorted(tuple(r) for r in pipe.history(spark).collect()) == before


def test_occupancy_collapse_of_absent_list_is_counted(spark, tmp_path):
    """A baseline list that a later epoch drops to ZERO vectors has no
    row in that epoch's report — its |0 - b_share| must still enter
    max_share_delta (ADVICE r8: the lst-keyed join silently skipped it,
    a false negative for exactly the collapse drift the monitor exists
    to catch). Constructed so the surviving lists' deltas stay AT the
    slack (not over): only the absent list's delta can trip the flag."""
    cents = _centroids(spark)
    pipe = EmbeddingDriftPipeline(str(tmp_path / "s"), cents)
    # baseline shares: 9/20, 8/20, 3/20 = (0.45, 0.40, 0.15)
    pipe.write_batch(
        _frame(spark, _batch([0] * 9 + [1] * 8 + [2] * 3, 0)), epoch_id=0
    )
    # epoch 1: list 102 collapses to zero; survivors (0.50, 0.50, 0)
    # deltas: 0.05 and 0.10 (== slack, not >); absent list: 0.15
    pipe.write_batch(
        _frame(spark, _batch([0] * 10 + [1] * 10, 100)), epoch_id=1
    )
    rows = {r["epoch"]: r for r in pipe.drift(spark, dist_slack=1.0).collect()}
    assert abs(rows[1]["max_share_delta"] - 0.15) < 1e-9
    assert rows[1]["drifted"]
    assert not rows[0]["drifted"]
