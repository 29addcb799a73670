"""Continuously-maintained funnel (streaming/funnel.py): epoch-by-
epoch maintenance equals one batch funnel over the concatenated
events (including a late re-anchoring step-0 event), replay is
idempotent, compaction is reader-invisible, the generalized key
schema works, and the foreachBatch wiring runs end-to-end."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_iot_pipeline_spark.operators.funnel import funnel
from cassandra_iot_pipeline_spark.streaming.funnel import (
    FunnelPipeline,
    streaming_funnel,
)

SCHEMA = "user_id BIGINT, ts TIMESTAMP, event_type STRING"
STEPS = ["a", "b", "c"]
HOUR = 3600


def _t(minutes: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


BATCHES = [
    [(1, _t(10), "a"), (2, _t(0), "a"), (1, _t(20), "b")],
    [(1, _t(30), "c"), (2, _t(5), "b")],
    [(3, _t(0), "b"), (3, _t(1), "a")],        # b before a: no chain yet
    # late re-anchor: user 1's EARLIER a arrives after their chain
    # completed; with a horizon this un-qualifies later steps
    [(1, _t(-200), "a"), (3, _t(2), "b")],
]
ALL = [r for b in BATCHES for r in b]


def _frame(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _fx(df):
    return sorted(tuple(r) for r in df.collect())


def test_epochs_equal_one_batch_funnel(spark, tmp_path):
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR,
        compact_every=2,
    )
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    want = funnel(_frame(spark, ALL), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)


def test_late_event_reanchors_the_chain(spark, tmp_path):
    """Before batch 3, user 1 completes a->b->c inside the horizon;
    the late earlier 'a' re-anchors them and the horizon cuts b and c
    — the non-monotone case that forces the on-read design."""
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    for i, rows in enumerate(BATCHES[:3]):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    mid = {r["step"]: r["n_users"] for r in pipe.funnel(spark).collect()}
    # user 1: a->b->c inside the horizon; user 2: a->b; user 3: only a
    # (their b precedes their a)
    assert mid == {"a": 3, "b": 2, "c": 1}
    pipe.write_batch(_frame(spark, BATCHES[3]), epoch_id=3)
    after = {r["step"]: r["n_users"] for r in pipe.funnel(spark).collect()}
    # user 1's anchor moved to t=-200 min; b@20' and c@30' are now
    # >1 h after it — their chain dies; user 3's late b@2' completes
    # a(1')->b(2')
    assert after == {"a": 3, "b": 2, "c": 0}


def test_replay_is_idempotent(spark, tmp_path):
    pipe = FunnelPipeline(str(tmp_path / "store"), STEPS)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    before = _fx(pipe.funnel(spark))
    n_pts = pipe.points(spark).count()
    pipe.write_batch(_frame(spark, BATCHES[1]), epoch_id=1)  # replay
    assert _fx(pipe.funnel(spark)) == before
    assert pipe.points(spark).count() == n_pts


def test_compaction_is_reader_invisible(spark, tmp_path):
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    for i, rows in enumerate(BATCHES[:3]):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    pre = _fx(pipe.funnel(spark))
    assert pipe.compact(spark) == 2
    assert _fx(pipe.funnel(spark)) == pre
    pipe.write_batch(_frame(spark, BATCHES[3]), epoch_id=3)
    want = funnel(_frame(spark, ALL), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)


def test_generalized_key_schema(spark, tmp_path):
    schema = "device_code STRING, ts TIMESTAMP, event_type STRING"
    rows = [("x", _t(0), "a"), ("x", _t(1), "b"), ("y", _t(0), "a")]
    pipe = FunnelPipeline(
        str(tmp_path / "store"),
        ["a", "b"],
        key="device_code",
        updates_schema=schema,
    )
    pipe.write_batch(_frame(spark, rows, schema), epoch_id=0)
    want = funnel(_frame(spark, rows, schema), ["a", "b"],
                  key="device_code")
    assert _fx(pipe.funnel(spark)) == _fx(want)
    with pytest.raises(ValueError, match="absent from events schema"):
        FunnelPipeline(
            str(tmp_path / "s2"), ["a", "b"], key="nope",
            updates_schema=schema,
        )


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        table = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_funnel(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        STEPS,
        horizon_seconds=HOUR,
        compact_every=2,
    )
    q.awaitTermination()
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    want = funnel(_frame(spark, ALL), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)


# --- horizon finalization -----------------------------------------------------


def test_finalize_equals_full_recompute(spark, tmp_path):
    """Declared-horizon finalization: closed users fold into one
    (k, hits) row each, their points leave the store, and the report
    stays BITWISE the full recompute (counts, rates, exact medians)
    for a horizon-respecting stream — across further epochs and a
    second finalize."""
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    # an advancing stream: each epoch a fresh user cohort one day on
    def cohort(day, users):
        rows = []
        for u in users:
            base = day * 1440
            rows.append((u, _t(base + 0), "a"))
            rows.append((u, _t(base + 10), "b"))
            if u % 2 == 0:
                rows.append((u, _t(base + 20), "c"))
        return rows

    batches = [cohort(d, range(10 * d, 10 * d + 4)) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    seen = [r for b in batches for r in b]
    pts_before = pipe.points(spark).count()

    # finalize with a 1-day lateness: day-0..1 cohorts close (anchor +
    # 1h horizon < max_time - 1d), day-2..3 stay live
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_users"] == 8
    assert pipe.points(spark).count() < pts_before  # GC actually bit
    want = funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)

    # more horizon-respecting epochs, then a second finalize
    batches2 = [cohort(d, range(10 * d, 10 * d + 4)) for d in (4, 5)]
    for j, rows in enumerate(batches2, start=4):
        pipe.write_batch(_frame(spark, rows), epoch_id=j)
    seen += [r for b in batches2 for r in b]
    assert _fx(pipe.funnel(spark)) == _fx(
        funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    )
    out2 = pipe.finalize(spark, lateness_seconds=86_400)
    assert out2["finalized_users"] > 0
    assert out2["watermark"] > out["watermark"]
    assert _fx(pipe.funnel(spark)) == _fx(
        funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    )
    assert pipe.quarantine_count(spark) == 0  # nothing violated


def test_finalized_user_late_arrival_is_quarantined_loudly(spark, tmp_path):
    """A horizon-VIOLATING point (event time under the finalization
    watermark) for a finalized user: the frozen report does not move,
    but the point is counted in quarantine — never silently dropped.
    A live user's late-but-legal point still folds."""
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    rows0 = [
        (1, _t(0), "a"), (1, _t(10), "b"),          # user 1: old, will close
        (2, _t(3 * 1440), "a"),                     # user 2: recent, live
    ]
    pipe.write_batch(_frame(spark, rows0), epoch_id=0)
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_users"] == 1
    frozen = _fx(pipe.funnel(spark))

    # user 1's chain-completing 'c' arrives with an event time far
    # under the watermark: a violation of the declared horizon
    late = [(1, _t(20), "c")]
    pipe.write_batch(_frame(spark, late), epoch_id=1)
    assert _fx(pipe.funnel(spark)) == frozen  # frozen, not corrupted
    q = pipe.quarantine(spark).collect()
    assert len(q) == 1 and q[0]["k"] == 1 and q[0]["s"] == 2
    assert pipe.quarantine_count(spark) == 1

    # user 2's late 'b' is ABOVE the watermark: legal, folds normally
    legal = [(2, _t(3 * 1440 + 10), "b")]
    pipe.write_batch(_frame(spark, legal), epoch_id=2)
    got = {r["step"]: r["n_users"] for r in pipe.funnel(spark).collect()}
    assert got["b"] == 2  # user 1 (frozen) + user 2 (live late point)
    assert pipe.quarantine_count(spark) == 1  # unchanged


def test_finalize_guards_and_noop_paths(spark, tmp_path):
    """finalize without a chain horizon raises; an empty store and a
    non-advancing watermark are no-ops."""
    nopipe = FunnelPipeline(str(tmp_path / "nh"), STEPS)
    with pytest.raises(ValueError, match="horizon_seconds"):
        nopipe.finalize(spark, lateness_seconds=60)

    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    assert pipe.finalize(spark, 60) == {
        "finalized_users": 0,
        "watermark": None,
    }
    pipe.write_batch(
        _frame(spark, [(1, _t(0), "a"), (1, _t(5), "b")]), epoch_id=0
    )
    out = pipe.finalize(spark, lateness_seconds=0)
    # lateness 0: cutoff == max us == the 'b' time; anchor+1h >= cutoff
    assert out["finalized_users"] == 0
    # nothing finalized -> reads equal the plain fold
    want = funnel(
        _frame(spark, [(1, _t(0), "a"), (1, _t(5), "b")]),
        STEPS,
        horizon_seconds=HOUR,
    )
    assert _fx(pipe.funnel(spark)) == _fx(want)


def test_streaming_wrapper_with_finalize_cadence(spark, tmp_path):
    """finalize_every wires the declared-horizon tier through the real
    foreachBatch path (the compact_every pattern): after the drain,
    closed users sit in fin/ and the report still equals the batch
    recompute. The mismatched-params guard raises."""
    with pytest.raises(ValueError, match="finalize_every"):
        FunnelPipeline(str(tmp_path / "x"), STEPS, finalize_every=2)

    src = tmp_path / "src"
    src.mkdir()
    batches = []
    for d in range(4):
        rows = []
        for u in range(10 * d, 10 * d + 3):
            base = d * 1440
            rows.append((u, _t(base), "a"))
            rows.append((u, _t(base + 10), "b"))
        batches.append(rows)
    for i, rows in enumerate(batches):
        table = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_funnel(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        STEPS,
        horizon_seconds=HOUR,
        finalize_every=2,
        finalize_lateness_seconds=86_400,
    )
    q.awaitTermination()
    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )
    assert pipe.fin_watermark(spark) is not None  # the cadence fired
    seen = [r for b in batches for r in b]
    want = funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    assert _fx(pipe.funnel(spark)) == _fx(want)


def test_trend_served_from_store_and_fin_rows(spark, tmp_path):
    """The per-anchor-period trend view served from the store equals
    the batch funnel_trend over the concatenated events — before AND
    after finalization (finalized hits rows carry their anchor)."""
    from cassandra_iot_pipeline_spark.operators.funnel import funnel_trend

    pipe = FunnelPipeline(
        str(tmp_path / "store"), STEPS, horizon_seconds=HOUR
    )

    def cohort(day, users):
        rows = []
        for u in users:
            base = day * 1440
            rows.append((u, _t(base + 0), "a"))
            rows.append((u, _t(base + 10), "b"))
            if u % 2 == 0:
                rows.append((u, _t(base + 20), "c"))
        return rows

    batches = [cohort(d, range(10 * d, 10 * d + 4)) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    seen = [r for b in batches for r in b]
    want = _fx(
        funnel_trend(_frame(spark, seen), STEPS, 86_400, horizon_seconds=HOUR)
    )
    assert _fx(pipe.trend(spark, 86_400)) == want
    assert pipe.finalize(spark, lateness_seconds=86_400)[
        "finalized_users"
    ] == 8
    assert _fx(pipe.trend(spark, 86_400)) == want


# --- additive finalization tier (r11, verdict #1) ------------------------


def _cohort(day, users, complete_mod=2):
    rows = []
    for u in users:
        base = day * 1440
        rows.append((u, _t(base + 0), "a"))
        rows.append((u, _t(base + 10), "b"))
        if u % complete_mod == 0:
            rows.append((u, _t(base + 20), "c"))
    return rows


def _rank_median(deltas):
    import math

    s = sorted(deltas)
    return s[max(1, math.ceil(0.5 * len(s))) - 1]


def _step_deltas(spark, rows, steps=STEPS, horizon=HOUR):
    """Per-step micros-from-first deltas of the full recompute — the
    additive tier's median contract is against the rank convention
    over exactly these."""
    from pyspark.sql import functions as F

    from cassandra_iot_pipeline_spark.operators.funnel import (
        step_points,
        user_hits,
    )

    hits = user_hits(
        step_points(_frame(spark, rows), steps), steps, horizon
    )
    out = {}
    for r in (
        hits.select(
            F.element_at("hits", 1).alias("t0"),
            F.posexplode("hits").alias("step_idx", "us"),
        )
        .filter("us IS NOT NULL")
        .select("step_idx", (F.col("us") - F.col("t0")).alias("d"))
        .collect()
    ):
        out.setdefault(r["step_idx"], []).append(r["d"])
    return out


def test_additive_tier_counts_bitwise_medians_within_alpha(spark, tmp_path):
    """fin_mode='additive': counts, conversion/step rates and means
    are BITWISE the full recompute across two finalizes; medians are
    DDSketch estimates within alpha of the exact rank-median; the fin
    store holds bucket rows (bounded by periods x steps x buckets),
    not per-user rows; trend() serves exact counts at multiples of
    the baked period and refuses others."""
    alpha = 0.01
    pipe = FunnelPipeline(
        str(tmp_path / "store"),
        STEPS,
        horizon_seconds=HOUR,
        fin_mode="additive",
        fin_alpha=alpha,
    )
    batches = [_cohort(d, range(10 * d, 10 * d + 4)) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    seen = [r for b in batches for r in b]
    pts_before = pipe.points(spark).count()
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_users"] == 8
    assert pipe.points(spark).count() < pts_before  # GC bit

    batches2 = [_cohort(d, range(10 * d, 10 * d + 4)) for d in (4, 5)]
    for j, rows in enumerate(batches2, start=4):
        pipe.write_batch(_frame(spark, rows), epoch_id=j)
    seen += [r for b in batches2 for r in b]
    out2 = pipe.finalize(spark, lateness_seconds=86_400)
    assert out2["finalized_users"] > 0
    assert out2["watermark"] > out["watermark"]

    want = funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    got_rows = sorted(
        (tuple(r) for r in pipe.funnel(spark).collect())
    )
    want_rows = sorted((tuple(r) for r in want.collect()))
    # columns 0..5 (idx, step, n_users, conversion, step_rate, avg):
    # bitwise; column 6 (median): within the alpha contract vs the
    # rank-median of the true delta set
    assert [r[:6] for r in got_rows] == [r[:6] for r in want_rows]
    deltas = _step_deltas(spark, seen)
    for r in got_rows:
        step_idx, est = r[0], r[6]
        if r[2] == 0:
            assert est is None
            continue
        true = _rank_median(deltas[step_idx])
        if true == 0:
            assert est == 0.0
        else:
            assert abs(est - true) <= alpha * true, (step_idx, est, true)

    # fin store: bucket rows, not per-user rows (cohort deltas are
    # identical, so one bucket per (period, step))
    fin_rows = pipe._fin_raw(spark).count()
    closed = out["finalized_users"] + out2["finalized_users"]
    assert fin_rows < closed * len(STEPS)

    # trend: exact counts at the baked period; a non-multiple refuses
    from cassandra_iot_pipeline_spark.operators.funnel import funnel_trend

    want_tr = funnel_trend(
        _frame(spark, seen), STEPS, 86_400, horizon_seconds=HOUR
    )
    assert _fx(pipe.trend(spark, 86_400)) == _fx(want_tr)
    assert _fx(pipe.trend(spark, 2 * 86_400)) == _fx(
        funnel_trend(
            _frame(spark, seen), STEPS, 2 * 86_400, horizon_seconds=HOUR
        )
    )
    with pytest.raises(ValueError, match="multiples"):
        pipe.trend(spark, 3600)


def test_additive_tier_full_replay_after_gc_stays_bitwise(spark, tmp_path):
    """Crash-equivalent state: every pre-finalize epoch replayed AFTER
    the fin write + GC (all folded points back on disk alongside the
    fin rows). The watermark-complement live filter must exclude the
    folded users' rebuilt chains — counts stay bitwise."""
    pipe = FunnelPipeline(
        str(tmp_path / "store"),
        STEPS,
        horizon_seconds=HOUR,
        fin_mode="additive",
    )
    batches = [_cohort(d, range(10 * d, 10 * d + 4)) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    seen = [r for b in batches for r in b]
    pipe.finalize(spark, lateness_seconds=86_400)
    before = [
        r[:6]
        for r in sorted(tuple(x) for x in pipe.funnel(spark).collect())
    ]
    for i, rows in enumerate(batches):  # full replay, post-GC
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    after = [
        r[:6]
        for r in sorted(tuple(x) for x in pipe.funnel(spark).collect())
    ]
    assert after == before
    # and a re-run finalize is a no-op (watermark cannot advance)
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_users"] == 0


def test_additive_tier_journey_semantics_divergence_pinned(spark, tmp_path):
    """THE STATED TRADE: a finalized user re-entering the funnel with
    a NEW step-0 at t >= wm counts as a new JOURNEY in the additive
    tier; the exact tier's fin-key anti-join freezes them. Both
    behaviors pinned side by side."""
    mk = lambda mode, d: FunnelPipeline(  # noqa: E731
        str(tmp_path / d),
        STEPS,
        horizon_seconds=HOUR,
        fin_mode=mode,
    )
    exact, add = mk("user", "e"), mk("additive", "a")
    rows0 = [
        (1, _t(0), "a"),
        (1, _t(10), "b"),
        (2, _t(3 * 1440), "a"),  # keeps the stream's max time ahead
    ]
    for p in (exact, add):
        p.write_batch(_frame(spark, rows0), epoch_id=0)
        out = p.finalize(spark, lateness_seconds=86_400)
        assert out["finalized_users"] == 1

    # user 1 re-enters ABOVE the watermark: a legal arrival
    re_entry = [(1, _t(3 * 1440 + 5), "a"), (1, _t(3 * 1440 + 6), "b")]
    for p in (exact, add):
        p.write_batch(_frame(spark, re_entry), epoch_id=1)
    n_exact = {r["step"]: r["n_users"] for r in exact.funnel(spark).collect()}
    n_add = {r["step"]: r["n_users"] for r in add.funnel(spark).collect()}
    assert n_exact["a"] == 2  # users 1 (frozen) and 2
    assert n_add["a"] == 3    # user 1's SECOND journey counts again
    assert n_add["b"] == 2    # both of user 1's journeys reached b


def test_additive_tier_partial_replay_is_shadowed_by_the_gc_base(
    spark, tmp_path
):
    """A replay of ONE pre-finalize epoch after the GC could in
    principle re-surface a folded user's SECONDARY step-0 as a
    spurious live journey (its true anchor's epoch is not replayed,
    so the rebuilt chain anchors late enough to pass the watermark
    complement). It cannot: the GC's compact_store committed
    ``base_upto = max epoch``, and the store ignores re-created epoch
    dirs at or under it — the replayed dir is SHADOWED, counts stay
    exact."""
    pipe = FunnelPipeline(
        str(tmp_path / "store"),
        STEPS,
        horizon_seconds=HOUR,
        fin_mode="additive",
    )
    # user 1: true anchor at t0, a SECOND step-0 late in the same day
    # (chosen so the rebuilt chain alone would pass the wm complement)
    rows0 = [(1, _t(0), "a"), (1, _t(10), "b")]
    rows1 = [(1, _t(23 * 60), "a")]           # secondary anchor
    rows2 = [(2, _t(2 * 1440), "a")]          # advances the stream
    pipe.write_batch(_frame(spark, rows0), epoch_id=0)
    pipe.write_batch(_frame(spark, rows1), epoch_id=1)
    pipe.write_batch(_frame(spark, rows2), epoch_id=2)
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_users"] == 1
    a_count = {r["step"]: r["n_users"] for r in pipe.funnel(spark).collect()}
    assert a_count["a"] == 2  # folded user 1 + live user 2

    # partial replay of ONLY the secondary-anchor epoch: shadowed
    pipe.write_batch(_frame(spark, rows1), epoch_id=1)
    from cassandra_iot_pipeline_spark.store import store_parts

    _, upto, _ = store_parts(spark, pipe.pts_dir)
    assert upto >= 1  # the GC's base covers the replayed epoch
    after = {r["step"]: r["n_users"] for r in pipe.funnel(spark).collect()}
    assert after == a_count  # no spurious journey


def test_additive_tier_fin_written_gc_crashed_stays_bitwise(
    spark, tmp_path, monkeypatch
):
    """The real crash window: fin epoch committed, GC never ran (the
    folded users' FULL point sets still on disk). The live read's
    watermark complement must exclude their rebuilt chains — counts
    bitwise — and the next finalize must not re-fold them."""
    import cassandra_iot_pipeline_spark.streaming.funnel as sfmod

    pipe = FunnelPipeline(
        str(tmp_path / "store"),
        STEPS,
        horizon_seconds=HOUR,
        fin_mode="additive",
    )
    batches = [_cohort(d, range(10 * d, 10 * d + 4)) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    seen = [r for b in batches for r in b]
    pts_before = pipe.points(spark).count()
    monkeypatch.setattr(sfmod, "compact_store", lambda *a, **k: None)
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_users"] == 8
    monkeypatch.undo()
    assert pipe.points(spark).count() == pts_before  # GC really skipped

    want = funnel(_frame(spark, seen), STEPS, horizon_seconds=HOUR)
    got = sorted(tuple(r) for r in pipe.funnel(spark).collect())
    assert [r[:6] for r in got] == [
        r[:6] for r in sorted(tuple(x) for x in want.collect())
    ]
    # the next advance folds ONLY the [prev, cutoff') interval — the
    # crash-window leftovers are never re-folded
    pipe.write_batch(
        _frame(spark, _cohort(5, range(50, 54))), epoch_id=4
    )
    seen += _cohort(5, range(50, 54))
    out2 = pipe.finalize(spark, lateness_seconds=86_400)
    assert out2["finalized_users"] == 8  # day-2..3 cohorts, not day-0..1
    got2 = sorted(tuple(r) for r in pipe.funnel(spark).collect())
    assert [r[:6] for r in got2] == [
        r[:6]
        for r in sorted(
            tuple(x)
            for x in funnel(
                _frame(spark, seen), STEPS, horizon_seconds=HOUR
            ).collect()
        )
    ]


def test_fin_store_tail_fold_is_reader_invisible_both_modes(spark, tmp_path):
    """One fin epoch lands per finalize — unbounded on a long stream.
    compact_fin_tail folds the tail with each mode's associative fold
    (distinct / regroup-sum): reads and the watermark are unchanged
    bitwise, and the additive fold CONTRACTS the store."""
    for mode in ("user", "additive"):
        pipe = FunnelPipeline(
            str(tmp_path / mode),
            STEPS,
            horizon_seconds=HOUR,
            fin_mode=mode,
        )
        epoch = 0
        for d in (0, 2, 4):  # three finalizes -> three fin epochs
            pipe.write_batch(
                _frame(spark, _cohort(d, range(10 * d, 10 * d + 4))),
                epoch_id=epoch,
            )
            epoch += 1
            pipe.write_batch(
                _frame(spark, _cohort(d + 1, range(100 + d, 104 + d))),
                epoch_id=epoch,
            )
            epoch += 1
            pipe.finalize(spark, lateness_seconds=86_400)
        from cassandra_iot_pipeline_spark.store import store_parts

        _, _, fin_epochs = store_parts(spark, pipe.fin_dir)
        assert len(fin_epochs) >= 2
        before = sorted(tuple(r) for r in pipe.funnel(spark).collect())
        wm_before = pipe.fin_watermark(spark)
        rows_before = pipe._fin_raw(spark).count()
        assert pipe.compact_fin_tail(spark) is not None
        assert sorted(
            tuple(r) for r in pipe.funnel(spark).collect()
        ) == before, mode
        assert pipe.fin_watermark(spark) == wm_before
        _, _, fin_epochs2 = store_parts(spark, pipe.fin_dir)
        assert len(fin_epochs2) == 1
        if mode == "additive":
            assert pipe._fin_raw(spark).count() <= rows_before


def test_additive_tier_collapsed_read_with_fin_max_buckets(spark, tmp_path):
    """fin_max_buckets bounds the median read's per-step bucket fold
    (the DDSketch collapse tier): counts stay bitwise, the median
    estimate stays within alpha for ranks above the collapsed mass —
    here the cap exceeds the populated buckets, so the read is
    bitwise the uncapped one."""
    mk = lambda d, cap: FunnelPipeline(  # noqa: E731
        str(tmp_path / d),
        STEPS,
        horizon_seconds=HOUR,
        fin_mode="additive",
        fin_max_buckets=cap,
    )
    capped, plain = mk("c", 64), mk("p", None)
    batches = [_cohort(d, range(10 * d, 10 * d + 4)) for d in range(3)]
    for i, rows in enumerate(batches):
        capped.write_batch(_frame(spark, rows), epoch_id=i)
        plain.write_batch(_frame(spark, rows), epoch_id=i)
    for p in (capped, plain):
        p.finalize(spark, lateness_seconds=86_400)
    assert _fx(capped.funnel(spark)) == _fx(plain.funnel(spark))
