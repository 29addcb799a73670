"""Priority sampling (functions/sampling.py::priority_sample):
selection/threshold/estimator parity against a from-scratch reference
(downstream of the shared hash uniforms), partition invariance,
exhaustive-group contract, weight-proportionality, unbiasedness of the
subset-sum estimator (on the reference, which is pinned equal), and
the distributed-top-k plan for the global form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions.sampling import (
    _U53,
    _uniform53,
    priority_sample,
)
from tests.conftest import SF_DIR


def _uniforms(spark, keys, seed):
    """The shared hash uniforms, computed once through the engine's own
    expression — the reference reproduces everything DOWNSTREAM of the
    hash in pure Python floats."""
    df = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    return {
        r["k"]: r["u"]
        for r in df.select(
            "k", _uniform53(F.col("k"), seed).alias("u")
        ).collect()
    }


def ref_priority_sample(rows, us, k):
    """rows: [(key, w)]; us: key -> u. Returns (kept dict key->est_w,
    tau)."""
    qs = sorted(
        ((w / us[key], key, w) for key, w in rows if w and w > 0),
        reverse=True,
    )
    tau = qs[k][0] if len(qs) > k else 0.0
    return {key: max(float(w), tau) for _, key, w in qs[:k]}, tau


ROWS = [(i, float(1 + (i * 7) % 13)) for i in range(40)]


def test_matches_reference_global_and_grouped(spark):
    us = _uniforms(spark, [k for k, _ in ROWS], seed=3)
    df = spark.createDataFrame(ROWS, "key BIGINT, w DOUBLE")
    got = {
        r["key"]: r["est_w"]
        for r in priority_sample(df, "key", "w", 8, seed=3).collect()
    }
    want, _ = ref_priority_sample(ROWS, us, 8)
    assert got == want  # bitwise: one IEEE division + max on both sides

    # grouped: two strata sampled independently
    gdf = spark.createDataFrame(
        [(k, w, k % 2) for k, w in ROWS], "key BIGINT, w DOUBLE, g BIGINT"
    )
    got_g = {
        (r["g"], r["key"]): r["est_w"]
        for r in priority_sample(
            gdf, "key", "w", 5, group="g", seed=3
        ).collect()
    }
    for g in (0, 1):
        sub = [(k, w) for k, w in ROWS if k % 2 == g]
        want_g, _ = ref_priority_sample(sub, us, 5)
        assert {k: v for (gg, k), v in got_g.items() if gg == g} == want_g


def test_partition_invariance(spark):
    df = spark.createDataFrame(ROWS, "key BIGINT, w DOUBLE")
    a = sorted(
        tuple(r)
        for r in priority_sample(df, "key", "w", 8, seed=1).collect()
    )
    b = sorted(
        tuple(r)
        for r in priority_sample(
            df.repartition(17), "key", "w", 8, seed=1
        ).collect()
    )
    assert a == b


def test_exhaustive_group_keeps_all_with_true_weights(spark):
    df = spark.createDataFrame(ROWS[:5], "key BIGINT, w DOUBLE")
    got = priority_sample(df, "key", "w", 50, seed=0).collect()
    assert len(got) == 5
    assert all(r["est_w"] == r["w"] for r in got)  # tau absent -> w


def test_zero_null_negative_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, None), (4, -2.0), (5, 1.0)],
        "key BIGINT, w DOUBLE",
    )
    kept = {r["key"] for r in priority_sample(df, "key", "w", 10).collect()}
    assert kept == {1, 5}


def test_weight_proportional_inclusion_and_unbiasedness():
    # pure-reference statistics (the reference is pinned equal above):
    # a 10x-weight row must be sampled far more often, and the
    # subset-sum estimator must be unbiased across seeds
    import random

    rng = random.Random(5)
    rows = [(i, 10.0 if i == 0 else 1.0) for i in range(30)]
    total = sum(w for _, w in rows)
    hits0 = 0
    est_sums = []
    n_trials = 400
    for _ in range(n_trials):
        us = {k: (rng.getrandbits(53) + 1) / _U53 for k, _ in rows}
        kept, _ = ref_priority_sample(rows, us, 6)
        hits0 += 0 in kept
        est_sums.append(sum(kept.values()))
    base_rate = 6 / 30
    assert hits0 / n_trials > 3 * base_rate  # heavy row oversampled
    mean_est = sum(est_sums) / n_trials
    assert abs(mean_est - total) < 0.05 * total  # unbiased within noise


def test_global_form_is_distributed_topk(spark):
    events = load_table(spark, SF_DIR, "events")
    plan = (
        priority_sample(events, "event_id", "value", 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_fixture_sample_properties(spark):
    events = load_table(spark, SF_DIR, "events").filter("value > 0")
    got = priority_sample(events, "event_id", "value", 50, seed=9)
    rows = got.collect()
    assert len(rows) == 50
    # estimation weights are never below the row's own weight
    assert all(r["est_w"] >= r["value"] for r in rows)
    # deterministic across a second evaluation
    again = priority_sample(events, "event_id", "value", 50, seed=9)
    assert sorted(r["event_id"] for r in rows) == sorted(
        r["event_id"] for r in again.collect()
    )
