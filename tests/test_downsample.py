"""LTTB downsampling (operators/downsample.py): from-scratch Python
reference twin, hand-checkable selections, structural invariants on
the fixture, pass-through for short series, and the plan shape (one
exchange by key)."""

from __future__ import annotations

import re

import numpy as np
import pytest

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.downsample import (
    _lttb_indices,
    lttb,
)
from cassandra_iot_pipeline_spark.plans import formatted_plan
from tests.conftest import SF_DIR


def _reference_lttb(xs: list[float], ys: list[float], n_out: int) -> list[int]:
    """Independent scalar-Python LTTB (Steinarsson 2013 §4.2):
    sequential loops, explicit running sums for the bucket means."""
    n = len(xs)
    if n <= n_out:
        return list(range(n))
    nb = n_out - 2
    lo = lambda b: (b * (n - 2)) // nb + 1  # noqa: E731
    kept = [0]
    prev = 0
    for b in range(nb):
        if b + 1 < nb:
            j0, j1 = lo(b + 1), lo(b + 2)
            nx = sum(xs[j0:j1]) / (j1 - j0)
            ny = sum(ys[j0:j1]) / (j1 - j0)
        else:
            nx, ny = xs[n - 1], ys[n - 1]
        best, best_area = None, -1.0
        for i in range(lo(b), lo(b + 1)):
            area = abs(
                (xs[prev] - nx) * (ys[i] - ys[prev])
                - (xs[prev] - xs[i]) * (ny - ys[prev])
            )
            if area > best_area:
                best, best_area = i, area
        kept.append(best)
        prev = best
    kept.append(n - 1)
    return kept


def test_matches_reference_on_random_series():
    rng = np.random.default_rng(42)
    for n, n_out in [(100, 10), (1000, 50), (57, 3), (500, 499)]:
        x = np.sort(rng.choice(10**9, size=n, replace=False)).astype(
            np.int64
        )
        y = rng.normal(size=n)
        got = _lttb_indices(x, y, n_out).tolist()
        want = _reference_lttb([float(v) for v in x], y.tolist(), n_out)
        assert got == want, (n, n_out)


def test_spike_is_kept():
    """A single extreme spike in a flat series is always selected —
    the visual-fidelity property LTTB exists for."""
    x = np.arange(1000, dtype=np.int64)
    y = np.zeros(1000)
    y[437] = 100.0
    kept = _lttb_indices(x, y, 20)
    assert 437 in kept.tolist()


def test_short_series_pass_through():
    x = np.arange(5, dtype=np.int64)
    y = np.arange(5, dtype=np.float64)
    assert _lttb_indices(x, y, 10).tolist() == [0, 1, 2, 3, 4]


def test_rejects_tiny_n_out():
    with pytest.raises(ValueError):
        _lttb_indices(np.arange(10), np.arange(10.0), 2)


def test_fixture_invariants(spark):
    """Per user: exactly n_out rows (series are longer), first/last
    timestamps preserved, output is a subset of input rows, points
    strictly time-ordered."""
    events = load_table(spark, SF_DIR, "events")
    n_out = 12
    out = lttb(events, n_out, key="user_id").toPandas()
    raw = events.select("user_id", "ts", "value").toPandas()
    for uid, grp in out.groupby("user_id"):
        src = raw[raw.user_id == uid].sort_values(["ts", "value"])
        assert len(grp) == min(n_out, len(src))
        g = grp.sort_values("ts")
        assert g.ts.iloc[0] == src.ts.iloc[0]
        assert g.ts.iloc[-1] == src.ts.iloc[-1]
        assert g.ts.is_monotonic_increasing
        merged = g.merge(src, on=["user_id", "ts", "value"], how="left",
                         indicator=True)
        assert (merged["_merge"] == "both").all()


def test_deterministic_across_partitionings(spark):
    """The selection is invariant to how the input is partitioned
    (sort inside the group is total: ts then value)."""
    events = load_table(spark, SF_DIR, "events")
    a = lttb(events, 15, key="user_id").toPandas()
    b = lttb(events.repartition(13), 15, key="user_id").toPandas()
    key = ["user_id", "ts", "value"]
    pa = a.sort_values(key).reset_index(drop=True)
    pb = b.sort_values(key).reset_index(drop=True)
    assert pa.equals(pb)


def test_single_exchange_plan(spark):
    events = load_table(spark, SF_DIR, "events")
    plan = formatted_plan(lttb(events, 100, key="user_id"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "FlatMapGroupsInPandas" in plan
