"""Continuously-maintained attribution (streaming/attribution.py):
the live report is bitwise equal to the batch operator over the
concatenated events under randomized batch boundaries, a LATE touch
re-opens first-touch credit and re-shares linear credit (the
non-monotonicity that forces the on-read design), replay idempotence,
and compaction (full + tail) invisibility."""

from __future__ import annotations

import datetime as dt
import random

from cassandra_iot_pipeline_spark.operators.attribution import attribution
from cassandra_iot_pipeline_spark.store import compact_epochs
from cassandra_iot_pipeline_spark.streaming.attribution import (
    AttributionPipeline,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


ROWS = [
    (1, _t(0), 1, "view"),
    (2, _t(5), 1, "click"),
    (3, _t(7), 1, "view"),
    (4, _t(10), 1, "purchase"),
    (5, _t(40), 2, "click"),
    (6, _t(42), 2, "purchase"),
    (7, _t(20), 3, "view"),
    (8, _t(30), 3, "purchase"),
    (9, _t(55), 2, "error"),  # non-attribution type: filtered on write
]


def _frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _report(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_under_random_boundaries(spark, tmp_path):
    want = _report(
        attribution(_frame(spark, ROWS), "purchase", ("view", "click"), 600)
    )
    rng = random.Random(7)
    for trial in range(2):
        rows = ROWS[:]
        rng.shuffle(rows)
        cuts = sorted(rng.sample(range(1, len(rows)), 2))
        batches = [
            rows[: cuts[0]],
            rows[cuts[0] : cuts[1]],
            rows[cuts[1] :],
        ]
        pipe = AttributionPipeline(
            str(tmp_path / f"s{trial}"),
            "purchase",
            ("view", "click"),
            600,
            compact_every=2,
        )
        for i, b in enumerate(batches):
            pipe.write_batch(_frame(spark, b), epoch_id=i)
        assert _report(pipe.report(spark)) == want, trial
        # the non-attribution event type never lands in the store
        assert (
            pipe.points(spark).filter("t = 'error'").count() == 0
        )


def test_late_touch_reopens_credit(spark, tmp_path):
    """User 2's conversion is first attributed to its click; a LATE
    view BEFORE the click re-opens first-touch credit and re-shares
    linear credit — exactly the non-monotonicity the on-read design
    exists for."""
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )
    pipe.write_batch(_frame(spark, ROWS), epoch_id=0)
    before = {
        r["touch_type"]: (r["first_touch"], r["linear_units"])
        for r in pipe.report(spark).collect()
    }
    assert before["click"] == (1, 333333 + 1_000_000)
    pipe.write_batch(
        _frame(spark, [(10, _t(38), 2, "view")]), epoch_id=1
    )
    after = {
        r["touch_type"]: (r["first_touch"], r["linear_units"])
        for r in pipe.report(spark).collect()
    }
    # user 2's first touch flips to the late view; linear re-shares
    assert after["click"] == (0, 333333 + 500_000)
    assert after["view"][0] == before["view"][0] + 1


def test_replay_and_compactions_invisible(spark, tmp_path):
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )
    thirds = [ROWS[:3], ROWS[3:6], ROWS[6:]]
    for i, b in enumerate(thirds):
        pipe.write_batch(_frame(spark, b), epoch_id=i)
    before = _report(pipe.report(spark))
    pipe.write_batch(_frame(spark, thirds[1]), epoch_id=1)  # replay
    assert _report(pipe.report(spark)) == before
    # tail compaction (associative distinct fold), then the full fold
    assert compact_epochs(
        spark,
        pipe.pts_dir,
        spark.createDataFrame([], pipe.schema),
        fold=lambda df: df.distinct(),
        keep_recent=1,
    ) == 1
    assert _report(pipe.report(spark)) == before
    assert pipe.compact(spark) == 2
    assert _report(pipe.report(spark)) == before


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassandra_iot_pipeline_spark.streaming.attribution import (
        streaming_attribution,
    )

    src = tmp_path / "src"
    src.mkdir()
    thirds = [ROWS[:3], ROWS[3:6], ROWS[6:]]
    for i, rows in enumerate(thirds):
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_attribution(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        "purchase",
        ("view", "click"),
        600,
        compact_every=2,
    )
    q.awaitTermination()
    pipe = AttributionPipeline(
        str(tmp_path / "store"), "purchase", ("view", "click"), 600
    )
    want = _report(
        attribution(_frame(spark, ROWS), "purchase", ("view", "click"), 600)
    )
    assert _report(pipe.report(spark)) == want


# --- horizon finalization -----------------------------------------------------


def _day(d: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=d, minutes=minute)


def _nsreport(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: ("" if t[0] is None else t[0], *t[1:]),
    )


def test_attribution_finalize_equals_full_recompute(spark, tmp_path):
    """Closed conversions fold into additive fin rows, their points
    and unreachable touches leave the store, and the report stays
    BITWISE the full recompute — across further epochs and a second
    finalize. The per-conversion micro-credit rounding is what makes
    the fin rows additive."""
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )

    def cohort(d, uid, eid):
        return [
            (eid, _day(d, 0), uid, "view"),
            (eid + 1, _day(d, 3), uid, "click"),
            (eid + 2, _day(d, 5), uid, "purchase"),
            (eid + 3, _day(d, 50), uid, "purchase"),  # unattributed
        ]

    batches = [cohort(d, 100 + d, 10 * d) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    seen = [r for b in batches for r in b]
    pts_before = pipe.points(spark).count()

    out = pipe.finalize(spark, lateness_seconds=86_400)
    # max us = day3+50min; cutoff = day2+50min: the fold is STRICT-<
    # (r11 boundary rule: a conversion at exactly the watermark stays
    # live and folds at the next advance), so day-0/1 close fully,
    # day 2 closes its attributed purchase but its day2+50min
    # unattributed purchase sits exactly AT the cutoff and stays live
    assert out["finalized_conversions"] == 5
    assert pipe.points(spark).count() < pts_before
    want = attribution(_frame(spark, seen), "purchase", ("view", "click"), 600)
    assert _nsreport(pipe.report(spark)) == _nsreport(want)

    batches2 = [cohort(d, 100 + d, 10 * d) for d in (4, 5)]
    for j, rows in enumerate(batches2, start=4):
        pipe.write_batch(_frame(spark, rows), epoch_id=j)
    seen += [r for b in batches2 for r in b]
    assert _nsreport(pipe.report(spark)) == _nsreport(
        attribution(_frame(spark, seen), "purchase", ("view", "click"), 600)
    )
    out2 = pipe.finalize(spark, lateness_seconds=86_400)
    # cutoff' = day4+50min: the day2+50min boundary straggler plus
    # day 3's two plus day 4's attributed purchase fold; day 4's
    # unattributed purchase sits AT the new cutoff and stays live
    assert out2["finalized_conversions"] == 4
    assert out2["watermark"] > out["watermark"]
    assert _nsreport(pipe.report(spark)) == _nsreport(
        attribution(_frame(spark, seen), "purchase", ("view", "click"), 600)
    )
    assert pipe.quarantine_count(spark) == 0


def test_attribution_late_arrivals_quarantine_and_live_credit(
    spark, tmp_path
):
    """After finalize: a conversion under the watermark is frozen out
    of the report but counted loudly in quarantine; a touch under the
    watermark still credits a LIVE conversion whose window reaches it
    (and is copied to quarantine too — it violated the declared
    lateness even though part of its effect applies)."""
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )
    rows0 = [
        (1, _day(0, 0), 1, "view"),
        (2, _day(0, 5), 1, "purchase"),
        (3, _day(2, 5), 2, "view"),  # keeps day-2 event time in store
    ]
    pipe.write_batch(_frame(spark, rows0), epoch_id=0)
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_conversions"] == 1
    wm = out["watermark"]  # day1 05:00 in micros

    # a live conversion just above the watermark whose 10-min window
    # reaches BELOW it
    live_rows = [(4, _day(1, 9), 3, "purchase")]
    pipe.write_batch(_frame(spark, live_rows), epoch_id=1)
    # its crediting touch arrives late, UNDER the watermark (day1 02:00)
    late_touch = [(5, _day(1, 2), 3, "click")]
    pipe.write_batch(_frame(spark, late_touch), epoch_id=2)
    # a conversion arriving under the watermark: frozen out, loud
    late_conv = [(6, _day(0, 30), 1, "purchase")]
    pipe.write_batch(_frame(spark, late_conv), epoch_id=3)

    got = {
        r["touch_type"]: (r["first_touch"], r["last_touch"], r["linear_units"])
        for r in pipe.report(spark).collect()
    }
    # finalized: u1 view-credited conversion; live: u3's conversion
    # credited to the late-but-window-reachable click
    assert got["view"] == (1, 1, 1_000_000)
    assert got["click"] == (1, 1, 1_000_000)
    assert None not in got  # the frozen-out late conv is NOT reported
    q = sorted(r["tie"] for r in pipe.quarantine(spark).collect())
    assert q == [5, 6]  # both violations counted, neither silently gone


def test_attribution_finalize_noop_paths(spark, tmp_path):
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )
    assert pipe.finalize(spark, 60) == {
        "finalized_conversions": 0,
        "watermark": None,
    }
    pipe.write_batch(
        _frame(spark, [(1, _t(0), 1, "view"), (2, _t(5), 1, "purchase")]),
        epoch_id=0,
    )
    # lateness covering the whole span: nothing closes
    out = pipe.finalize(spark, lateness_seconds=10 * 86_400)
    assert out["finalized_conversions"] == 0
    want = attribution(
        _frame(spark, [(1, _t(0), 1, "view"), (2, _t(5), 1, "purchase")]),
        "purchase",
        ("view", "click"),
        600,
    )
    assert _nsreport(pipe.report(spark)) == _nsreport(want)


def test_streaming_wrapper_with_finalize_cadence(spark, tmp_path):
    """finalize_every through the real foreachBatch wiring: closed
    conversions fold mid-stream and the drained report equals the
    batch recompute; the mismatched-params guard raises."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from cassandra_iot_pipeline_spark.streaming.attribution import (
        streaming_attribution,
    )

    with pytest.raises(ValueError, match="finalize_every"):
        AttributionPipeline(str(tmp_path / "x"), finalize_every=2)

    src = tmp_path / "src"
    src.mkdir()
    batches = []
    for d in range(4):
        rows = [
            (10 * d, _day(d, 0), 100 + d, "view"),
            (10 * d + 1, _day(d, 3), 100 + d, "click"),
            (10 * d + 2, _day(d, 5), 100 + d, "purchase"),
        ]
        batches.append(rows)
    for i, rows in enumerate(batches):
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_attribution(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        "purchase",
        ("view", "click"),
        600,
        finalize_every=2,
        finalize_lateness_seconds=86_400,
    )
    q.awaitTermination()
    pipe = AttributionPipeline(
        str(tmp_path / "store"), "purchase", ("view", "click"), 600
    )
    assert pipe.fin_watermark(spark) is not None
    seen = [r for b in batches for r in b]
    want = attribution(_frame(spark, seen), "purchase", ("view", "click"), 600)
    assert _nsreport(pipe.report(spark)) == _nsreport(want)


def test_attribution_finalize_position_model(spark, tmp_path):
    """The fin rows carry BOTH additive models: the position (U-shaped)
    report over a finalized store equals position_attribution's full
    recompute bitwise, across a finalize and further epochs."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        position_attribution,
    )

    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )

    def cohort(d, uid, eid):
        return [
            (eid, _day(d, 0), uid, "view"),
            (eid + 1, _day(d, 2), uid, "view"),
            (eid + 2, _day(d, 3), uid, "click"),
            (eid + 3, _day(d, 5), uid, "purchase"),
        ]

    batches = [cohort(d, 100 + d, 10 * d) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    out = pipe.finalize(spark, lateness_seconds=86_400)
    # cutoff = day2+5min: day-0/1 close; day 2's purchase sits exactly
    # AT the cutoff and stays live (the r11 strict-< fold boundary)
    assert out["finalized_conversions"] == 2
    seen = [r for b in batches for r in b]

    def nsp(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: ("" if t[0] is None else t[0], *t[1:]),
        )

    want = position_attribution(
        _frame(spark, seen), "purchase", ("view", "click"), 600
    )
    assert nsp(pipe.report(spark, model="position")) == nsp(want)
    # and the linear view from the SAME fin rows still holds
    want_lin = attribution(
        _frame(spark, seen), "purchase", ("view", "click"), 600
    )
    assert _nsreport(pipe.report(spark)) == _nsreport(want_lin)

    import pytest

    with pytest.raises(ValueError, match="model"):
        pipe.report(spark, model="timedecay")


# --- watermark boundary exactness (r11) -----------------------------------


def _us(micros: int) -> dt.datetime:
    # epoch-anchored: the session timezone is pinned UTC, so this
    # naive datetime's unix_micros equal ``micros`` exactly — the
    # boundary tests reason in absolute microseconds
    return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=micros)


def test_conversion_arriving_exactly_at_watermark_is_served(spark, tmp_path):
    """A legal late arrival at EXACTLY the watermark (the horizon
    contract admits t >= wm) must land on exactly one side of the
    boundary: served live now, folded at the next advance — the r10
    filters (serve > wm, fold > prev, quarantine < wm) dropped it
    silently between them."""
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )
    lb = 600 * 1_000_000
    lateness = 100 * 1_000_000
    # batch 0: one closed conversion well under the future cutoff,
    # and a max-event-time row that pins cutoff exactly
    hi = 10 * lb
    pipe.write_batch(
        _frame(
            spark,
            [
                (1, _us(0), 1, "view"),
                (2, _us(60 * 1_000_000), 1, "purchase"),
                (3, _us(hi), 2, "view"),
            ],
        ),
        epoch_id=0,
    )
    out = pipe.finalize(spark, lateness_seconds=100)
    assert out["finalized_conversions"] == 1
    wm = out["watermark"]
    assert wm == hi - lateness

    # late arrivals: a touch at exactly wm - lookback (the left GC
    # boundary; UNDER the watermark, so it is loudly quarantined AND
    # still credits the live window that reaches it) and a conversion
    # at exactly wm (legal: the horizon contract admits t >= wm)
    pipe.write_batch(
        _frame(spark, [(4, _us(wm - lb), 3, "click")]), epoch_id=1
    )
    assert pipe.quarantine_count(spark) == 1
    pipe.write_batch(_frame(spark, [(5, _us(wm), 3, "purchase")]), epoch_id=2)
    got = {
        r["touch_type"]: (r["first_touch"], r["last_touch"], r["linear_units"])
        for r in pipe.report(spark).collect()
    }
    # the boundary conversion IS served, credited to the boundary touch
    assert got["click"] == (1, 1, 1_000_000)
    assert got["view"] == (1, 1, 1_000_000)
    # the at-watermark conversion is NOT a violation
    assert pipe.quarantine_count(spark) == 1
    # the next advance folds the boundary conversion exactly once
    pipe.write_batch(
        _frame(spark, [(6, _us(hi + 10 * lb), 9, "view")]), epoch_id=3
    )
    out2 = pipe.finalize(spark, lateness_seconds=100)
    assert out2["finalized_conversions"] == 1
    got2 = {
        r["touch_type"]: (r["first_touch"], r["last_touch"], r["linear_units"])
        for r in pipe.report(spark).collect()
    }
    assert got2 == got


def test_gc_boundary_touches_across_finalize_and_replay_cycles(
    spark, tmp_path
):
    """Adversarial GC boundary (r10 verdict #6): touches straddling
    exactly cutoff - lookback, conversions at cutoff and cutoff + 1us
    arriving after multiple finalize/GC/replay cycles — the report
    stays bitwise the full recompute over the horizon-respecting
    events; a quarantined touch still credits a live conversion whose
    window reaches it."""
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )
    lb = 600 * 1_000_000
    hi = 10 * lb
    lateness = 100
    wm = hi - lateness * 1_000_000
    batch0 = [
        (11, _us(1_000), 1, "view"),        # a closed conversion pair
        (12, _us(2_000), 1, "purchase"),    # (sets the watermark)
        (1, _us(wm - lb), 4, "click"),      # exactly AT the left edge
        (2, _us(wm - lb - 1), 5, "view"),   # 1us outside every window
        (3, _us(hi), 2, "view"),            # pins the cutoff
    ]
    pipe.write_batch(_frame(spark, batch0), epoch_id=0)
    out = pipe.finalize(spark, lateness_seconds=lateness)
    assert out["watermark"] == wm
    assert out["finalized_conversions"] == 1
    # replay epoch 0 AFTER the watermark advanced: the pts epoch
    # rewrite is idempotent, and the below-watermark rows are loudly
    # (re-)quarantined with the CURRENT watermark stamped on them —
    # the documented count-drift-with-diagnosable-stamps contract
    pipe.write_batch(_frame(spark, batch0), epoch_id=0)
    assert pipe.quarantine_count(spark) == 4
    assert all(
        r["qwm"] == wm for r in pipe.quarantine(spark).collect()
    )
    out_r = pipe.finalize(spark, lateness_seconds=lateness)
    assert out_r["watermark"] == wm  # no advance on replayed data

    # late legal conversions: user 4 at exactly wm (window reaches the
    # wm - lb touch inclusively) and user 4 at wm + 1us
    late1 = [(6, _us(wm), 4, "purchase")]
    late2 = [(7, _us(wm + 1), 4, "purchase")]
    pipe.write_batch(_frame(spark, late1), epoch_id=1)
    pipe.write_batch(_frame(spark, late2), epoch_id=2)
    assert pipe.quarantine_count(spark) == 4  # both arrivals legal

    legal = batch0 + late1 + late2
    want = _nsreport(
        attribution(_frame(spark, legal), "purchase", ("view", "click"), 600)
    )
    assert _nsreport(pipe.report(spark)) == want

    # advance the horizon; fold; replay the late epochs; fold again
    pipe.write_batch(
        _frame(spark, [(8, _us(hi + 5 * lb), 2, "view")]), epoch_id=3
    )
    legal = legal + [(8, _us(hi + 5 * lb), 2, "view")]
    assert pipe.finalize(spark, lateness_seconds=lateness)[
        "finalized_conversions"
    ] == 2
    pipe.write_batch(_frame(spark, late1), epoch_id=1)  # replay post-GC
    pipe.write_batch(_frame(spark, late2), epoch_id=2)
    pipe.finalize(spark, lateness_seconds=lateness)
    assert _nsreport(pipe.report(spark)) == want
    # the post-advance replays re-quarantined their now-under rows
    assert pipe.quarantine_count(spark) == 6

    # quarantined-touch-then-live-conversion: a touch UNDER the new
    # watermark (violation, loud) whose window a live conversion reaches
    wm2 = pipe.fin_watermark(spark)
    pipe.write_batch(_frame(spark, [(9, _us(wm2 - 60), 6, "click")]), epoch_id=4)
    assert pipe.quarantine_count(spark) == 7
    pipe.write_batch(_frame(spark, [(10, _us(wm2 + 60), 6, "purchase")]), epoch_id=5)
    got = {
        r["touch_type"]: (r["first_touch"], r["last_touch"])
        for r in pipe.report(spark).collect()
    }
    want_full = {
        r["touch_type"]: (r["first_touch"], r["last_touch"])
        for r in attribution(
            _frame(
                spark,
                legal + [(9, _us(wm2 - 60), 6, "click"), (10, _us(wm2 + 60), 6, "purchase")],
            ),
            "purchase",
            ("view", "click"),
            600,
        ).collect()
    }
    assert got == want_full


# --- quarantine retention / doctor (r11) -----------------------------------


def test_quarantine_retention_count_preserving_and_doctor(spark, tmp_path):
    """The quarantine store's growth levers (r10 verdict #2): tail
    folds are reader-invisible, prune() ages out detail rows while the
    count survives, the doctor flags a planted growing quarantine, and
    rows carry the watermark that judged them."""
    pipe = AttributionPipeline(
        str(tmp_path / "s"), "purchase", ("view", "click"), 600
    )
    pipe.write_batch(
        _frame(
            spark,
            [
                (1, _day(0, 0), 1, "view"),
                (2, _day(0, 5), 1, "purchase"),  # closes -> sets the wm
                (3, _day(2, 0), 2, "view"),
            ],
        ),
        epoch_id=0,
    )
    out = pipe.finalize(spark, lateness_seconds=86_400)
    wm = out["watermark"]
    assert wm is not None

    # a persistently-late source: five micro-batches of violations
    for i in range(5):
        pipe.write_batch(
            _frame(spark, [(10 + i, _day(0, 1 + i), 3 + i, "click")]),
            epoch_id=1 + i,
        )
    assert pipe.quarantine_count(spark) == 5
    rows = sorted(tuple(r) for r in pipe.quarantine(spark).collect())
    assert all(r[0] == wm for r in rows)  # wm-stamped

    # doctor flags the growth
    doc = pipe.doctor(spark)
    assert doc["quarantine"]["growing"]
    assert "quarantine growing" in doc["quarantine"]["store"]["recommendation"]

    # tail fold: reader-invisible
    assert pipe.quarantine_store.compact_tail(spark, keep_recent=1) is not None
    assert sorted(tuple(r) for r in pipe.quarantine(spark).collect()) == rows

    # prune: detail ages out, the count is invariant
    pruned = pipe.prune_quarantine(spark, keep_recent=1)
    assert pruned["pruned_rows"] == 4
    assert pipe.quarantine_count(spark) == 5
    live = pipe.quarantine(spark).collect()
    assert len(live) == 1
    assert pipe.quarantine_store.pruned_total(spark) == 4
    # prune is re-runnable / idempotent
    again = pipe.prune_quarantine(spark, keep_recent=1)
    assert again["pruned_rows"] == 0
    assert pipe.quarantine_count(spark) == 5
    # doctor no longer reports growth after retention
    assert not pipe.doctor(spark)["quarantine"]["growing"]


def test_attribution_finalize_decay_model(spark, tmp_path):
    """The fin rows carry the time-decay model when a half-life is
    configured: report(model='decay') over a finalized store equals
    time_decay_attribution's full recompute bitwise, across a
    finalize and further epochs; unconfigured pipelines refuse the
    model."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        time_decay_attribution,
    )

    pipe = AttributionPipeline(
        str(tmp_path / "s"),
        "purchase",
        ("view", "click"),
        600,
        decay_half_life_seconds=60,
    )

    def cohort(d, uid, eid):
        return [
            (eid, _day(d, 0), uid, "view"),
            (eid + 1, _day(d, 2), uid, "view"),
            (eid + 2, _day(d, 3), uid, "click"),
            (eid + 3, _day(d, 5), uid, "purchase"),
        ]

    batches = [cohort(d, 100 + d, 10 * d) for d in range(4)]
    for i, rows in enumerate(batches):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    out = pipe.finalize(spark, lateness_seconds=86_400)
    assert out["finalized_conversions"] == 2
    batches2 = [cohort(d, 100 + d, 10 * d) for d in (4, 5)]
    for j, rows in enumerate(batches2, start=4):
        pipe.write_batch(_frame(spark, rows), epoch_id=j)
    seen = [r for b in (batches + batches2) for r in b]

    def nsd(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: ("" if t[0] is None else t[0], *t[1:]),
        )

    want = time_decay_attribution(
        _frame(spark, seen),
        "purchase",
        ("view", "click"),
        lookback_seconds=600,
        half_life_seconds=60,
    )
    assert nsd(pipe.report(spark, model="decay")) == nsd(want)
    # the linear view from the SAME fin rows still holds
    assert _nsreport(pipe.report(spark)) == _nsreport(
        attribution(_frame(spark, seen), "purchase", ("view", "click"), 600)
    )

    import pytest

    bare = AttributionPipeline(
        str(tmp_path / "bare"), "purchase", ("view", "click"), 600
    )
    with pytest.raises(ValueError, match="decay_half_life_seconds"):
        bare.report(spark, model="decay")
    with pytest.raises(ValueError, match="divisible"):
        AttributionPipeline(
            str(tmp_path / "bad"),
            "purchase",
            ("view", "click"),
            600,
            decay_half_life_seconds=77,
        )


def test_attribution_fin_store_tail_fold_is_reader_invisible(
    spark, tmp_path
):
    """compact_fin_tail folds the per-finalize fin epochs with the
    additive regroup (wm by max): every model's report is unchanged
    bitwise and the store contracts to one row per channel."""
    pipe = AttributionPipeline(
        str(tmp_path / "s"),
        "purchase",
        ("view", "click"),
        600,
        decay_half_life_seconds=60,
    )

    def cohort(d, uid, eid):
        return [
            (eid, _day(d, 0), uid, "view"),
            (eid + 1, _day(d, 3), uid, "click"),
            (eid + 2, _day(d, 5), uid, "purchase"),
        ]

    epoch = 0
    for d in (0, 2, 4):
        pipe.write_batch(
            _frame(spark, cohort(d, 100 + d, 10 * d)), epoch_id=epoch
        )
        epoch += 1
        pipe.write_batch(
            _frame(spark, cohort(d + 1, 200 + d, 100 + 10 * d)),
            epoch_id=epoch,
        )
        epoch += 1
        pipe.finalize(spark, lateness_seconds=86_400)
    from cassandra_iot_pipeline_spark.store import store_parts

    _, _, fin_epochs = store_parts(spark, pipe.fin_dir)
    assert len(fin_epochs) >= 2
    before = {
        m: _nsreport(pipe.report(spark, model=m))
        for m in ("linear", "position", "decay")
    }
    wm_before = pipe.fin_watermark(spark)
    assert pipe.compact_fin_tail(spark) is not None
    for m in ("linear", "position", "decay"):
        assert _nsreport(pipe.report(spark, model=m)) == before[m], m
    assert pipe.fin_watermark(spark) == wm_before
    _, _, fin_epochs2 = store_parts(spark, pipe.fin_dir)
    assert len(fin_epochs2) == 1


def test_quarantine_prune_cadence_runs_in_write_batch(spark, tmp_path):
    """quarantine_prune_every wires the retention cadence into the
    write path: detail epochs age out automatically, the violation
    count survives (the Quarantine.prune invariant)."""
    pipe = AttributionPipeline(
        str(tmp_path / "s"),
        "purchase",
        ("view", "click"),
        600,
        quarantine_prune_every=4,
    )
    pipe.write_batch(
        _frame(
            spark,
            [
                (1, _day(0, 0), 1, "view"),
                (2, _day(0, 5), 1, "purchase"),
                (3, _day(2, 0), 2, "view"),
            ],
        ),
        epoch_id=0,
    )
    pipe.finalize(spark, lateness_seconds=86_400)
    # epochs 1..7: persistently-late source; the cadence prunes at
    # epochs 3 and 7 (keep_recent=4 detail epochs survive each pass)
    for i in range(1, 8):
        pipe.write_batch(
            _frame(spark, [(10 + i, _day(0, 1 + i), 3 + i, "click")]),
            epoch_id=i,
        )
    assert pipe.quarantine_count(spark) == 7
    assert pipe.quarantine_store.pruned_total(spark) > 0
    live_epochs = pipe.doctor(spark)["quarantine"]["live_epochs"]
    assert len(live_epochs) <= 4
