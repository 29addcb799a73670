"""DDSketch quantiles (operators/quantiles.py + streaming/quantiles
.py): the alpha relative-error bound against exact percentiles on
randomized long-tailed data (incl. negatives and zeros), hand-computed
small cases, merge associativity, streamed ≡ one-pass batch exactly,
replay idempotence, compaction (full + tail) invisibility, and the
fixture end-to-end."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.quantiles import (
    dd_quantiles,
    dd_quantiles_from_sketch,
    dd_sketch,
)
from cassandra_iot_pipeline_spark.streaming.quantiles import QuantilePipeline
from tests.conftest import SF_DIR

QS = (0.01, 0.25, 0.5, 0.9, 0.99)


def _exact(values, q):
    """The module's rank convention: max(1, ceil(q*n))-th smallest."""
    s = sorted(values)
    r = max(1, math.ceil(q * len(s)))
    return s[r - 1]


def _frame(spark, values, g="a"):
    return spark.createDataFrame(
        [(g, float(v)) for v in values], "g STRING, value DOUBLE"
    )


def test_alpha_bound_on_longtailed_data(spark):
    rng = random.Random(42)
    values = [rng.lognormvariate(0, 2.5) for _ in range(4000)]
    alpha = 0.02
    got = {
        r["q"]: r["est"]
        for r in dd_quantiles(
            _frame(spark, values), ["g"], "value", QS, alpha
        ).collect()
    }
    for q in QS:
        true = _exact(values, q)
        # one extra gamma step of slack for IEEE boundary landings
        # (module docstring)
        gamma = (1 + alpha) / (1 - alpha)
        assert abs(got[q] - true) <= alpha * abs(true) * gamma + 1e-12, q


def test_signs_and_zeros(spark):
    values = [-100.0, -1.0, 0.0, 0.0, 1.0, 100.0]
    got = {
        r["q"]: r["est"]
        for r in dd_quantiles(
            _frame(spark, values), ["g"], "value", (0.01, 0.5, 0.99), 0.01
        ).collect()
    }
    assert got[0.01] < -90  # the most negative bucket
    assert got[0.5] == 0.0  # the zero lane returns exactly 0
    assert got[0.99] > 90


def test_merge_is_associative_and_stream_equals_batch(spark, tmp_path):
    rng = random.Random(7)
    batches = [
        [rng.expovariate(0.1) for _ in range(300)] for _ in range(3)
    ]
    pipe = QuantilePipeline(
        str(tmp_path / "s"), ["g"], "value", alpha=0.02, compact_every=2
    )
    for i, vs in enumerate(batches):
        pipe.write_batch(_frame(spark, vs), epoch_id=i)
    all_vals = [v for b in batches for v in b]
    want = sorted(
        tuple(r)
        for r in dd_sketch(
            _frame(spark, all_vals), ["g"], "value", 0.02
        ).collect()
    )
    got = sorted(tuple(r) for r in pipe.sketch(spark).collect())
    assert got == want  # streamed fold ≡ one-pass batch sketch, bitwise
    # quantile reads agree too
    wq = sorted(
        tuple(r)
        for r in dd_quantiles(
            _frame(spark, all_vals), ["g"], "value", QS, 0.02
        ).collect()
    )
    gq = sorted(tuple(r) for r in pipe.quantiles(spark, QS).collect())
    assert gq == wq


def test_replay_and_tail_compaction_invisible(spark, tmp_path):
    rng = random.Random(3)
    batches = [[rng.uniform(0.1, 50) for _ in range(200)] for _ in range(3)]
    pipe = QuantilePipeline(str(tmp_path / "s"), ["g"], "value", alpha=0.05)
    for i, vs in enumerate(batches):
        pipe.write_batch(_frame(spark, vs), epoch_id=i)
    before = sorted(tuple(r) for r in pipe.sketch(spark).collect())
    pipe.write_batch(_frame(spark, batches[1]), epoch_id=1)  # replay
    assert sorted(tuple(r) for r in pipe.sketch(spark).collect()) == before
    assert pipe.compact_tail(spark, keep_recent=1) == 1
    assert sorted(tuple(r) for r in pipe.sketch(spark).collect()) == before
    assert pipe.compact(spark) == 2
    assert sorted(tuple(r) for r in pipe.sketch(spark).collect()) == before


def test_fixture_grouped_quantiles(spark):
    """Per-event-type medians on the fixture stay within alpha of the
    exact percentile, and the bucket state is range-ratio bounded."""
    events = load_table(spark, SF_DIR, "events")
    alpha = 0.01
    got = {
        (r["event_type"], r["q"]): r["est"]
        for r in dd_quantiles(
            events, ["event_type"], "value", (0.5,), alpha
        ).collect()
    }
    exact = {
        (r["event_type"], 0.5): r["m"]
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for k, est in got.items():
        true = exact[k]
        assert abs(est - true) <= 0.03 * abs(true) + 0.02, k
    sk = dd_sketch(events, ["event_type"], "value", alpha)
    per_group = sk.groupBy("event_type").count().agg(F.max("count")).first()[0]
    assert per_group < 2000  # log-gamma bounded, not value-proportional


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassandra_iot_pipeline_spark.streaming.quantiles import (
        streaming_quantiles,
    )

    rng = random.Random(11)
    src = tmp_path / "src"
    src.mkdir()
    batches = [[rng.expovariate(0.2) for _ in range(200)] for _ in range(3)]
    for i, vs in enumerate(batches):
        table = pa.table(
            {
                "g": pa.array(["a"] * len(vs), pa.string()),
                "value": pa.array(vs, pa.float64()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_quantiles(
        spark,
        str(src),
        "g STRING, value DOUBLE",
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        group_cols=["g"],
        alpha=0.02,
        compact_every=2,
    )
    q.awaitTermination()
    pipe = QuantilePipeline(str(tmp_path / "store"), ["g"], "value", 0.02)
    got = sorted(tuple(r) for r in pipe.quantiles(spark, QS).collect())
    want = sorted(
        tuple(r)
        for r in dd_quantiles(
            _frame(spark, [v for b in batches for v in b]),
            ["g"],
            "value",
            QS,
            0.02,
        ).collect()
    )
    assert got == want


# --- collapsing tier ----------------------------------------------------------


def _adversarial(rng, n=3000):
    """A poisoned long-tail: values spanning ~7 decades (the
    broken-sensor regime the plain sketch's range-ratio bound loses
    to), with most mass in the top two decades."""
    vals = []
    for _ in range(n):
        if rng.random() < 0.15:
            vals.append(rng.uniform(1e-3, 1.0))  # the junk tail
        else:
            vals.append(rng.uniform(1e3, 1e4))  # the real signal
    return vals


def test_collapse_bounds_buckets_and_keeps_alpha_above_floor(spark):
    from cassandra_iot_pipeline_spark.operators.quantiles import (
        collapse_sketch,
    )

    rng = random.Random(17)
    vals = _adversarial(rng)
    alpha, mb = 0.01, 64
    frame = _frame(spark, vals)
    plain = dd_sketch(frame, ["g"], "value", alpha)
    n_plain = plain.count()
    assert n_plain > mb  # the adversarial corpus actually overflows
    capped = dd_sketch(frame, ["g"], "value", alpha, max_buckets=mb)
    assert capped.count() == mb
    # mass is conserved through the collapse
    assert (
        capped.agg(F.sum("cnt")).first()[0]
        == plain.agg(F.sum("cnt")).first()[0]
    )
    got = {
        r["q"]: (r["est"], r["collapsed_frac"])
        for r in dd_quantiles(
            frame, ["g"], "value", QS, alpha, max_buckets=mb
        ).collect()
    }
    gamma = (1 + alpha) / (1 - alpha)
    for q in QS:
        est, cf = got[q]
        assert 0.0 < cf < 0.5  # the junk tail collapsed, reported
        if q > cf:  # rank clears the collapsed mass -> alpha holds
            true = _exact(vals, q)
            assert abs(est - true) <= alpha * abs(true) * gamma + 1e-12, q
    # sanity: a q INSIDE the collapsed mass returns the floor estimate
    # (a single bucket for ~15% of mass spanning 3 decades)
    inside = {
        r["q"]: r["est"]
        for r in dd_quantiles(
            frame, ["g"], "value", (0.001, 0.05), alpha, max_buckets=mb
        ).collect()
    }
    assert inside[0.001] == inside[0.05]  # both land in the one floor

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_buckets"):
        collapse_sketch(plain, ["g"], 1)


def test_collapse_is_merge_invariant(spark):
    """collapse(collapse(A) + B) == collapse(A + B) bitwise — the
    property that lets collapsed epoch deltas fold in any tree."""
    from cassandra_iot_pipeline_spark.operators.quantiles import (
        collapse_sketch,
    )

    rng = random.Random(23)
    a_vals = _adversarial(rng, 1500)
    b_vals = [rng.lognormvariate(2, 3) for _ in range(1500)]
    alpha, mb = 0.02, 32
    a = dd_sketch(_frame(spark, a_vals), ["g"], "value", alpha)
    b = dd_sketch(_frame(spark, b_vals), ["g"], "value", alpha)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    want = rows(collapse_sketch(a.unionByName(b), ["g"], mb))
    got = rows(
        collapse_sketch(
            collapse_sketch(a, ["g"], mb).unionByName(b), ["g"], mb
        )
    )
    both = rows(
        collapse_sketch(
            collapse_sketch(a, ["g"], mb).unionByName(
                collapse_sketch(b, ["g"], mb)
            ),
            ["g"],
            mb,
        )
    )
    assert got == want and both == want


def test_collapsed_stream_equals_collapsed_batch(spark, tmp_path):
    """The full lifecycle with max_buckets on: collapsed epoch deltas,
    a replay, tail compaction, full compaction — reads stay bitwise
    equal to the one-pass collapsed batch sketch throughout."""
    rng = random.Random(29)
    batches = [_adversarial(rng, 700) for _ in range(3)]
    mb = 48
    pipe = QuantilePipeline(
        str(tmp_path / "s"), ["g"], "value", alpha=0.02, max_buckets=mb
    )
    for i, vs in enumerate(batches):
        pipe.write_batch(_frame(spark, vs), epoch_id=i)
    all_vals = [v for b in batches for v in b]
    want_sk = sorted(
        tuple(r)
        for r in dd_sketch(
            _frame(spark, all_vals), ["g"], "value", 0.02, max_buckets=mb
        ).collect()
    )

    def sk():
        return sorted(tuple(r) for r in pipe.sketch(spark).collect())

    assert sk() == want_sk
    assert len(want_sk) == mb
    pipe.write_batch(_frame(spark, batches[1]), epoch_id=1)  # replay
    assert sk() == want_sk
    assert pipe.compact_tail(spark, keep_recent=1) == 1
    assert sk() == want_sk
    assert pipe.compact(spark) == 2
    assert sk() == want_sk
    wq = sorted(
        tuple(r)
        for r in dd_quantiles(
            _frame(spark, all_vals), ["g"], "value", QS, 0.02, max_buckets=mb
        ).collect()
    )
    gq = sorted(tuple(r) for r in pipe.quantiles(spark, QS).collect())
    assert gq == wq
