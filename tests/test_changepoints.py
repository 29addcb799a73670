"""CUSUM change-point detection (operators/changepoints.py): parity
with an independently re-implemented scalar CUSUM, sustained-shift
vs single-spike discrimination, re-anchoring (one alarm per level
shift, not forever), downward shifts, multi-group independence, and
partition invariance."""

from __future__ import annotations

from cassandra_iot_pipeline_spark.operators.changepoints import (
    cusum_changepoints,
)


def _series(spark, rows):
    return spark.createDataFrame(
        rows, "g STRING, epoch BIGINT, m DOUBLE"
    )


def _detect(spark, values_by_group, k=0.1, h=1.0, baseline_n=3):
    rows = [
        (g, e, v)
        for g, vs in values_by_group.items()
        for e, v in enumerate(vs)
    ]
    out = cusum_changepoints(
        _series(spark, rows), ["g"], "m", "epoch", k=k, h=h,
        baseline_n=baseline_n,
    )
    return sorted(
        (r["g"], r["epoch"], r["direction"]) for r in out.collect()
    )


def ref(xs, k=0.1, h=1.0, baseline_n=3):
    """Independent scalar re-implementation (the test's own, not the
    library's helper)."""
    alarms, i = [], 0
    while i + baseline_n <= len(xs):
        mu0 = sum(xs[i : i + baseline_n]) / baseline_n
        sp = sn = 0.0
        fired = False
        for j in range(i + baseline_n, len(xs)):
            sp = max(0.0, sp + (xs[j] - mu0 - k))
            sn = max(0.0, sn + (mu0 - xs[j] - k))
            if sp > h or sn > h:
                alarms.append((j, "up" if sp > h else "down"))
                i = j
                fired = True
                break
        if not fired:
            break
    return alarms


def test_matches_independent_reference(spark):
    vs = [1.0, 1.1, 0.9, 1.0, 1.05, 2.2, 2.1, 2.3, 2.2, 2.15,
          2.2, 0.4, 0.5, 0.45]
    got = _detect(spark, {"a": vs})
    want = sorted(("a", e, d) for e, d in ref(vs))
    assert got == want
    assert len(want) == 2  # the up shift and the down shift


def test_sustained_shift_alarms_single_spike_does_not(spark):
    base = [1.0, 1.0, 1.0]
    spike = base + [1.0, 5.0, 1.0, 1.0, 1.0, 1.0]
    shift = base + [1.0, 1.6, 1.6, 1.6, 1.6, 1.6]
    # allowance 0.3 absorbs drift; h = 1.5: the 4.0-above-baseline
    # spike alarms instantly IF h were small, so pick h above the
    # single-step excess (5-1-0.3 = 3.7 > 1.5) — spike DOES alarm
    # with these numbers; use a milder spike within h
    spike = base + [1.0, 2.2, 1.0, 1.0, 1.0, 1.0]
    got_spike = _detect(spark, {"s": spike}, k=0.3, h=1.5)
    got_shift = _detect(spark, {"s": shift}, k=0.3, h=1.5)
    assert got_spike == []  # one 1.2-excess step, then decay
    assert len(got_shift) == 1  # 0.3/step accumulates past 1.5
    assert got_shift[0][2] == "up"


def test_reanchor_one_alarm_per_shift(spark):
    vs = [1.0] * 4 + [3.0] * 12  # shift once, stay at the new level
    got = _detect(spark, {"a": vs}, k=0.1, h=1.0)
    assert len(got) == 1
    # after re-anchoring at the alarm, the 3.0 plateau is the new
    # baseline — no further alarms despite 11 more high values


def test_groups_are_independent_and_partition_invariant(spark):
    flat = [1.0, 1.05, 0.95, 1.0, 1.02, 0.98, 1.0]
    shifty = [1.0, 1.0, 1.0, 2.5, 2.5, 2.5, 2.5]
    rows = [("flat", e, v) for e, v in enumerate(flat)]
    rows += [("shifty", e, v) for e, v in enumerate(shifty)]
    df = _series(spark, rows)
    out1 = sorted(
        tuple(r)
        for r in cusum_changepoints(
            df, ["g"], "m", k=0.1, h=1.0
        ).collect()
    )
    out2 = sorted(
        tuple(r)
        for r in cusum_changepoints(
            df.repartition(7), ["g"], "m", k=0.1, h=1.0
        ).collect()
    )
    assert out1 == out2
    assert [t[0] for t in out1] == ["shifty"]


def test_short_series_yield_nothing(spark):
    got = _detect(spark, {"a": [1.0, 2.0]}, baseline_n=3)
    assert got == []
