"""Conversion attribution (operators/attribution.py): hand-computed
first/last/linear credit on a constructed timeline (window edges,
ties, unattributed conversions), DuckDB parity on the fixture at two
lookbacks, exactness of the micro-credit sum (linear credit over a
conversion sums to 1), and the guards."""

from __future__ import annotations

import datetime as dt

import pytest

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.attribution import (
    attribution,
    attribution_oracle,
)
from tests.conftest import SF_DIR
from tools.oracle_check import compare

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second)


ROWS = [
    # user 1: view@12:00, click@12:05, view@12:07, purchase@12:10
    (1, _t(0), 1, "view"),
    (2, _t(5), 1, "click"),
    (3, _t(7), 1, "view"),
    (4, _t(10), 1, "purchase"),
    # user 2: click exactly AT the conversion microsecond (excluded,
    # strict <) and a view 30 min before a 10-min lookback (excluded):
    # conversion is unattributed
    (5, _t(40), 2, "click"),
    (6, _t(10), 2, "view"),
    (7, _t(40), 2, "purchase"),
    # user 3: touch exactly at the window's left edge (cts - L) counts
    (8, _t(20), 3, "view"),
    (9, _t(30), 3, "purchase"),
]


def _frame(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_hand_computed_models(spark):
    got = {
        r["touch_type"]: (
            r["first_touch"],
            r["last_touch"],
            r["linear_units"],
        )
        for r in attribution(
            _frame(spark), "purchase", ("view", "click"), 600
        ).collect()
    }
    # user 1: touches view,click,view (n=3) -> first=view, last=view,
    #         linear: view 2/3, click 1/3
    # user 2: unattributed (strict <, lookback edge)
    # user 3: single view at the left edge -> all credit to view
    assert got == {
        "view": (2, 2, 666667 + 1_000_000),
        "click": (0, 0, 333333),
        None: (1, 1, 0),
    }


def test_linear_credit_conserves_conversions(spark):
    rows = attribution(
        _frame(spark), "purchase", ("view", "click"), 600
    ).collect()
    total_units = sum(r["linear_units"] for r in rows)
    n_attributed = 2  # users 1 and 3
    # each attributed conversion distributes ~1.0 credit (rounding
    # leaves at most one micro-unit per (conversion, channel))
    assert abs(total_units - n_attributed * 1_000_000) <= 2


def test_fixture_duckdb_parity(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    for lookback in (86_400, 7 * 86_400):
        got = attribution(
            events, "purchase", ("view", "click", "signup"), lookback
        ).toPandas()
        want = duck.sql(
            attribution_oracle(
                "purchase", ("view", "click", "signup"), lookback
            )
        ).df()
        assert compare(got, want) == [], lookback
        assert len(got) >= 3


def test_guards(spark):
    with pytest.raises(ValueError, match="touch type"):
        attribution(_frame(spark), "purchase", ())
    with pytest.raises(ValueError, match="must not be one of"):
        attribution(_frame(spark), "view", ("view", "click"))


def _rows(df):
    return sorted(
        (
            tuple(r)
            for r in df.select(
                "touch_type",
                "first_touch",
                "last_touch",
                "linear_units",
                "linear_credit",
            ).collect()
        ),
        key=lambda t: ("" if t[0] is None else t[0], *t[1:]),
    )


def test_asof_attribution_bit_equal_on_hand_rows(spark):
    """The pair-free FULL report (running-count differences at the
    window edges) is bit-identical to the pair path on the constructed
    timeline — every edge the fixture plants (strict-<, boundary
    inclusion, unattributed NULL row, micro-credit rounding)."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        asof_attribution,
    )

    for lookback in (600, 1_200, 3_600):
        want = _rows(
            attribution(_frame(spark), "purchase", ("view", "click"), lookback)
        )
        got = _rows(
            asof_attribution(
                _frame(spark), "purchase", ("view", "click"), lookback
            )
        )
        assert got == want, lookback


def test_asof_attribution_bit_equal_on_fixture(spark):
    """Same contract on the sf fixture's events table, two lookbacks,
    three channels."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        asof_attribution,
    )

    events = load_table(spark, SF_DIR, "events")
    for lookback in (86_400, 7 * 86_400):
        want = _rows(
            attribution(events, "purchase", ("view", "click", "signup"), lookback)
        )
        got = _rows(
            asof_attribution(
                events, "purchase", ("view", "click", "signup"), lookback
            )
        )
        assert got == want, lookback


def test_asof_attribution_bit_equal_on_randomized_corpus(spark):
    """Seeded random corpus (dense per-user timelines, microsecond
    ties, conversions with zero/edge/full windows) — the bit-equality
    must hold beyond constructed cases."""
    import random

    from cassandra_iot_pipeline_spark.operators.attribution import (
        asof_attribution,
    )

    rng = random.Random(0xA77)
    base = dt.datetime(2024, 3, 1)
    types = ["view", "click", "signup", "purchase"]
    rows = []
    for eid in range(4_000):
        u = rng.randrange(120)
        # coarse second grid + frequent repeats force microsecond ties
        ts = base + dt.timedelta(
            seconds=rng.randrange(3 * 86_400),
            microseconds=rng.choice([0, 0, 1, 500_000]),
        )
        rows.append((eid, ts, u, rng.choice(types)))
    frame = spark.createDataFrame(rows, SCHEMA)
    for lookback in (900, 21_600, 86_400):
        want = _rows(
            attribution(frame, "purchase", ("view", "click", "signup"), lookback)
        )
        got = _rows(
            asof_attribution(
                frame, "purchase", ("view", "click", "signup"), lookback
            )
        )
        assert got == want, lookback


def test_asof_attribution_plan_has_no_join(spark):
    """Plan pin: the pair path's conversion x touch equi-join (and its
    per-conv_id window over pair rows) is GONE — the whole report is
    windows + aggregations; no Join operator of any kind appears."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        asof_attribution,
    )
    from cassandra_iot_pipeline_spark.plans import formatted_plan

    plan = formatted_plan(
        asof_attribution(_frame(spark), "purchase", ("view", "click"), 600)
    )
    assert "Join" not in plan
    assert plan.count("Window") >= 1


def test_first_last_fast_path_matches_full_operator(spark, duck):
    """The pair-free as-of form is bit-identical to the full
    operator's first/last columns — hand rows (window edges, strict-<,
    boundary-inclusive, unattributed) and the fixture at two
    lookbacks."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        first_last_attribution,
    )

    declared = ("view", "click", "signup")

    def proj(df, channels):
        # align row sets: the fast path reports every DECLARED channel
        # (zero-filled); the full operator reports channels with any
        # in-window touch — fill both to the declared set
        rows = {
            r["touch_type"]: (r["first_touch"], r["last_touch"])
            for r in df.collect()
        }
        return {c: rows.get(c, (0, 0)) for c in (*channels, None)}

    for lookback in (600,):
        want = proj(
            attribution(_frame(spark), "purchase", ("view", "click"), lookback),
            ("view", "click"),
        )
        got = proj(
            first_last_attribution(
                _frame(spark), "purchase", ("view", "click"), lookback
            ),
            ("view", "click"),
        )
        assert got == want, lookback

    events = load_table(spark, SF_DIR, "events")
    for lookback in (86_400, 7 * 86_400):
        want = proj(
            attribution(events, "purchase", declared, lookback), declared
        )
        got = proj(
            first_last_attribution(events, "purchase", declared, lookback),
            declared,
        )
        assert got == want, lookback


def test_first_last_fast_path_is_pair_free(spark):
    """Plan pin: no join between conversions and touches — two
    union-tag windows only (the join in the plan is the final
    k-row count merge, channel-bounded)."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        first_last_attribution,
    )
    from cassandra_iot_pipeline_spark.plans import formatted_plan

    plan = formatted_plan(
        first_last_attribution(_frame(spark), "purchase", ("view", "click"), 600)
    )
    assert plan.count("Window") >= 2
    # no Generate/explode (the full operator's two-bucket probe)
    assert "Generate" not in plan


# --- position-based (U-shaped) attribution ------------------------------------


def test_position_attribution_hand_computed(spark):
    from cassandra_iot_pipeline_spark.operators.attribution import (
        position_attribution,
    )

    got = {
        r["touch_type"]: (
            r["first_touch"],
            r["last_touch"],
            r["position_units"],
        )
        for r in position_attribution(
            _frame(spark), "purchase", ("view", "click"), 600
        ).collect()
    }
    # user 1: n=3 (view, click, view; first=view, last=view) ->
    #   view 0.4+0.4+0.2*(2-2)/1 = 0.8, click 0.2*1/1 = 0.2
    # user 2: unattributed; user 3: single view -> 1.0
    assert got == {
        "view": (2, 2, 800_000 + 1_000_000),
        "click": (0, 0, 200_000),
        None: (1, 1, 0),
    }


def test_position_attribution_two_touch_and_conservation(spark):
    """n=2 splits 50/50 (1.0 when both events share a channel); every
    attributed conversion's units total 1e6 ± one per channel."""
    import datetime as dt

    from cassandra_iot_pipeline_spark.operators.attribution import (
        position_attribution,
    )

    rows = [
        # user 5: exactly two touches, different channels
        (20, _t(1), 5, "view"),
        (21, _t(2), 5, "click"),
        (22, _t(5), 5, "purchase"),
        # user 6: exactly two touches, SAME channel
        (23, _t(1), 6, "click"),
        (24, _t(2), 6, "click"),
        (25, _t(5), 6, "purchase"),
    ]
    got = {
        r["touch_type"]: r["position_units"]
        for r in position_attribution(
            spark.createDataFrame(rows, SCHEMA), "purchase", ("view", "click"), 600
        ).collect()
    }
    assert got == {"view": 500_000, "click": 500_000 + 1_000_000}

    rows_all = ROWS + rows
    out = position_attribution(
        spark.createDataFrame(rows_all, SCHEMA), "purchase", ("view", "click"), 600
    ).collect()
    total = sum(r["position_units"] for r in out)
    n_attributed = 4  # users 1, 3, 5, 6
    assert abs(total - n_attributed * 1_000_000) <= 2 * 4


def test_position_attribution_fixture_duckdb_parity(spark, duck):
    """The pair-path DuckDB twin (fully independent of the as-of
    machinery) matches bitwise on the fixture at two lookbacks and a
    non-default weight split."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        position_attribution,
        position_attribution_oracle,
    )

    events = load_table(spark, SF_DIR, "events")
    for lookback, wf, wl in ((86_400, 0.4, 0.4), (7 * 86_400, 0.3, 0.5)):
        got = position_attribution(
            events, "purchase", ("view", "click", "signup"), lookback,
            w_first=wf, w_last=wl,
        ).toPandas()
        want = duck.sql(
            position_attribution_oracle(
                "purchase", ("view", "click", "signup"), lookback,
                w_first=wf, w_last=wl,
            )
        ).df()
        assert compare(got, want) == [], (lookback, wf, wl)
        assert len(got) >= 3

    with pytest.raises(ValueError, match="w_first"):
        position_attribution(
            _frame(spark), "purchase", ("view", "click"), 600,
            w_first=0.7, w_last=0.7,
        )


def test_asof_refactor_keeps_linear_bit_equality(spark):
    """The r10 _asof_conversion_stats extraction must not move
    asof_attribution by a bit (quick re-pin on the hand fixture)."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        asof_attribution,
    )

    want = _rows(attribution(_frame(spark), "purchase", ("view", "click"), 600))
    got = _rows(
        asof_attribution(_frame(spark), "purchase", ("view", "click"), 600)
    )
    assert got == want


def test_position_attribution_rejects_negative_weights(spark):
    """Individually negative weights must raise even when their sum
    lands in [0, 1] — a negative w_first yields negative per-channel
    credits."""
    import pytest as _pytest

    from cassandra_iot_pipeline_spark.operators.attribution import (
        position_attribution,
    )

    frame = spark.createDataFrame([], SCHEMA)
    with _pytest.raises(ValueError, match="each be >= 0"):
        position_attribution(frame, w_first=-0.2, w_last=1.0)
    with _pytest.raises(ValueError, match="each be >= 0"):
        position_attribution(frame, w_first=1.0, w_last=-0.2)


# --- time-decay (half-life) attribution (r11, verdict #4) ------------------


def test_time_decay_hand_computed_and_boundary_bucket(spark):
    """Pins the dyadic bucket contract: age in (j*H, (j+1)*H] carries
    2^-j — a touch at EXACTLY one half-life old is still bucket 0
    (weight 1); the normalized micro-units are one rounded division of
    exact scaled BIGINTs."""
    import datetime as dt

    from cassandra_iot_pipeline_spark.operators.attribution import (
        time_decay_attribution,
    )

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows = [
        (1, t(10, 30), 1, "click"),  # age 90min -> j=1, w=4 (K=4)
        (2, t(11, 0), 1, "click"),   # age EXACTLY 1h -> j=0, w=8
        (3, t(11, 30), 1, "view"),   # age 30min -> j=0, w=8
        (4, t(12, 0), 1, "purchase"),
    ]
    got = {
        r["touch_type"]: (
            r["first_touch"],
            r["last_touch"],
            r["decay_units"],
        )
        for r in time_decay_attribution(
            spark.createDataFrame(rows, SCHEMA),
            "purchase",
            ("view", "click"),
            lookback_seconds=4 * 3600,
            half_life_seconds=3600,
        ).collect()
    }
    # click S = 4 + 8 = 12, view S = 8, total 20
    assert got == {
        "click": (1, 0, 600_000),
        "view": (0, 1, 400_000),
    }


def test_time_decay_marker_form_equals_pair_twin_and_duckdb(spark, duck):
    """The marker-algebra form, the brute-force pair twin, and the
    DuckDB oracle agree BITWISE on the fixture at two half-life
    settings (the r10 exactness rule: every literal in the twin CAST
    to DOUBLE, buckets in pure integer arithmetic)."""
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.attribution import (
        time_decay_attribution,
        time_decay_attribution_oracle,
        time_decay_attribution_pairs,
    )
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    for lb, hl in ((86_400, 3_600), (7 * 86_400, 86_400)):
        kw = dict(
            conversion_type="purchase",
            touch_types=("view", "click"),
            lookback_seconds=lb,
            half_life_seconds=hl,
        )
        key = lambda t: ("" if t[0] is None else t[0])  # noqa: E731
        a = sorted(
            (tuple(r) for r in time_decay_attribution(ev, **kw).collect()),
            key=key,
        )
        b = sorted(
            (
                tuple(r)
                for r in time_decay_attribution_pairs(ev, **kw).collect()
            ),
            key=key,
        )
        o = sorted(
            (
                tuple(r)
                for r in duck.sql(
                    time_decay_attribution_oracle(**kw)
                ).fetchall()
            ),
            key=key,
        )
        assert a == b, (lb, hl)
        assert a == o, (lb, hl)


def test_time_decay_randomized_corpus(spark):
    """Marker algebra == pair path bitwise on a randomized corpus
    (dense same-microsecond collisions included)."""
    import datetime as dt
    import random

    from cassandra_iot_pipeline_spark.operators.attribution import (
        time_decay_attribution,
        time_decay_attribution_pairs,
    )

    rng = random.Random(42)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for eid in range(600):
        uid = rng.randrange(12)
        secs = rng.randrange(0, 3 * 86_400)
        etype = rng.choice(["view", "click", "view", "click", "purchase"])
        rows.append((eid, base + dt.timedelta(seconds=secs), uid, etype))
    frame = spark.createDataFrame(rows, SCHEMA)
    kw = dict(
        conversion_type="purchase",
        touch_types=("view", "click"),
        lookback_seconds=6 * 3600,
        half_life_seconds=1_800,
    )
    key = lambda t: ("" if t[0] is None else t[0])  # noqa: E731
    a = sorted(
        (tuple(r) for r in time_decay_attribution(frame, **kw).collect()),
        key=key,
    )
    b = sorted(
        (
            tuple(r)
            for r in time_decay_attribution_pairs(frame, **kw).collect()
        ),
        key=key,
    )
    assert a == b


def test_time_decay_additive_across_conversion_partitions(spark):
    """The fin-store additivity criterion (DESIGN.md): each
    conversion's channel units are a pure function of its own window,
    so the report over ANY partition of the conversion set sums
    bitwise to the whole-set report — the property that lets a
    streaming finalize fold closed conversions incrementally."""
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.attribution import (
        time_decay_attribution,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    kw = dict(
        conversion_type="purchase",
        touch_types=("view", "click"),
        lookback_seconds=86_400,
        half_life_seconds=3_600,
    )
    is_conv = F.col("event_type") == "purchase"
    half_a = ev.filter(~is_conv | (F.col("event_id") % 2 == 0))
    half_b = ev.filter(~is_conv | (F.col("event_id") % 2 == 1))

    def as_map(df):
        return {
            r["touch_type"]: (
                r["first_touch"],
                r["last_touch"],
                r["decay_units"],
            )
            for r in df.collect()
        }

    whole = as_map(time_decay_attribution(ev, **kw))
    pa = as_map(time_decay_attribution(half_a, **kw))
    pb = as_map(time_decay_attribution(half_b, **kw))
    summed = {
        ch: tuple(
            pa.get(ch, (0, 0, 0))[i] + pb.get(ch, (0, 0, 0))[i]
            for i in range(3)
        )
        for ch in set(pa) | set(pb)
    }
    assert summed == whole


def test_time_decay_validation(spark):
    import pytest as _pytest

    from cassandra_iot_pipeline_spark.operators.attribution import (
        time_decay_attribution,
    )

    frame = spark.createDataFrame([], SCHEMA)
    with _pytest.raises(ValueError, match="divisible"):
        time_decay_attribution(
            frame, lookback_seconds=100, half_life_seconds=33
        )
    with _pytest.raises(ValueError, match="half_life_seconds"):
        time_decay_attribution(
            frame, lookback_seconds=100, half_life_seconds=0
        )
    with _pytest.raises(ValueError, match="outside"):
        time_decay_attribution(
            frame, lookback_seconds=60 * 3600, half_life_seconds=3600
        )


def test_time_decay_plan_has_no_join_and_no_unbounded_frame(spark):
    """Plan pins for the routed marker form: no Join anywhere (the
    K+1 markers ride the one user-keyed sort), and no
    unbounded-FOLLOWING frame (the r11 lint class — the backward fill
    runs over the reversed sort)."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        time_decay_attribution,
    )
    from cassandra_iot_pipeline_spark.plans import (
        formatted_plan,
        unbounded_following_frames,
    )

    df = time_decay_attribution(
        _frame(spark),
        "purchase",
        ("view", "click"),
        lookback_seconds=600,
        half_life_seconds=60,
    )
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert plan.count("Window") >= 1
    assert unbounded_following_frames(df) == []


def test_unattributed_branch_stays_canonical_with_attributed(spark):
    """r12 optimization pin: the unattributed-row branch must carry the
    SAME per-conversion aggregation subtree as the attributed branch —
    if column pruning strips the positional-fill windows (or the decay
    model's scaled-weight sums) from it, the two union branches stop
    canonicalizing equal and the scan -> user-keyed sort -> window
    pipeline executes twice per report (measured 2 scan-stage
    executions before the _unattributed_row zero-guard, 1 after).
    Pinned structurally: the optimized plan must evaluate the fill
    windows in BOTH branches (4 last(pay) occurrences, 2 per branch),
    for every model."""
    from cassandra_iot_pipeline_spark.operators.attribution import (
        asof_attribution,
        position_attribution,
        time_decay_attribution,
    )

    for df in (
        asof_attribution(_frame(spark), "purchase", ("view", "click"), 600),
        position_attribution(
            _frame(spark), "purchase", ("view", "click"), 600
        ),
        time_decay_attribution(
            _frame(spark),
            "purchase",
            ("view", "click"),
            lookback_seconds=600,
            half_life_seconds=60,
        ),
    ):
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert optimized.count("last(pay") == 4, optimized
