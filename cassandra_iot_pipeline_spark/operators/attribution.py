"""Conversion attribution — which touch channels get credit for each
conversion, under the three standard models (first-touch, last-touch,
linear), within a lookback window.

Reference tie-in: the funnel (operators/funnel.py) asks whether users
progress through a prescribed order; attribution asks the inverse
product question over the same stream — given that a conversion
HAPPENED, which of the preceding touch events earns it. Together with
`event_transitions` they are the engagement family's three views.

Semantics, exactly: for each conversion event ``c`` (type =
``conversion_type``) of user ``u`` at microsecond ``t_c``, the
credited touches are the user's events with type in ``touch_types``
and ``t_c - lookback <= t < t_c`` (strictly before — a same-microsecond
touch does not credit itself, the funnel's strict-chain rule).

- first-touch: the earliest in-window touch — ties on the same
  microsecond break by ``tie_col``, a total order, so the winner is
  deterministic in both engines;
- last-touch: the latest, same tiebreak;
- linear: each touch EVENT carries ``1/n`` of the conversion (n = the
  conversion's in-window touch count), aggregated per channel.

Exactness: counts are BIGINTs. Linear credit is aggregated in integer
MICRO-credits — per (conversion, channel), ``ROUND(1e6 * cnt / n)``
is ONE deterministic double division + round (both engines compute
the identical correctly-rounded quotient; the exactmath units rule),
and the micro-credit SUM is an exact integer. The reported
``linear_credit`` is one final division. Conversions with NO
in-window touch are reported on a ``touch_type IS NULL`` row
(unattributed count) — dropped conversions would silently understate
the denominator.

Plan shape (pure Catalyst, the rangejoin bucket discipline): touches
and conversions equi-join on (user, lookback-sized time bucket) — a
conversion's window spans at most TWO buckets, so each conversion
probes two buckets and the exact range predicate filters after; no
unbounded range explosion, no per-user collect. Then ONE window over
conv_id (n, first/last keys ride the same exchange) and two bounded
aggregations (rows are conversions x channels).

Which form to call (all three bit-equal where they overlap, pinned):

- :func:`asof_attribution` — the DEFAULT for real streams. The full
  report (first/last/linear) pair-free: one user-keyed sort carrying
  per-channel running counts, cost INDEPENDENT of the lookback
  (measured 8.4 -> 13.3 s across 1 h -> 24 h, SCALE.md, vs
  10.4 -> 153 s for the pair path on the dense probe corpus).
- :func:`attribution` (this pair path) — only when pairs-per-
  conversion is known tiny (very short lookbacks / sparse users); its
  cost is conversions x in-window touches.
- :func:`first_last_attribution` — positional models only, with a
  declared-channel zero-filled report shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: composite (ts, tie) ordering key base: ts * 2^64 + tie, exact in
#: DECIMAL(38,0) / HUGEINT in both engines
_KEY_BASE = 18446744073709551616


def attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """(touch_type, first_touch, last_touch, linear_units,
    linear_credit): per channel, how many conversions it opened
    (first-touch), how many it closed (last-touch), and its linear
    credit in micro-credits + credits. The ``touch_type IS NULL`` row
    counts unattributed conversions (no in-window touch; zeros
    elsewhere). See module docstring for exact semantics."""
    touch_types = list(touch_types)
    if not touch_types:
        raise ValueError("attribution needs at least one touch type")
    if conversion_type in touch_types:
        raise ValueError(
            "conversion_type must not be one of touch_types "
            f"(got {conversion_type!r} in {touch_types})"
        )
    lb_us = lookback_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))

    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(key).alias("k"),
        us.alias("cts"),
        F.col(tie_col).alias("conv_id"),
    )
    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(key).alias("k"),
        us.alias("tts"),
        F.col(type_col).alias("touch"),
        F.col(tie_col).alias("touch_id"),
        F.expr(f"(unix_micros({ts_col})) div {lb_us}").alias("b"),
    )
    # each conversion's window spans at most two lookback-sized
    # buckets: probe (its own bucket, the previous one)
    probes = convs.select(
        "k",
        "cts",
        "conv_id",
        F.explode(
            F.array(
                F.expr(f"cts div {lb_us}"), F.expr(f"cts div {lb_us}") - 1
            )
        ).alias("b"),
    )
    pairs = probes.join(touches, ["k", "b"]).filter(
        (F.col("tts") < F.col("cts"))
        & (F.col("tts") >= F.col("cts") - lb_us)
    )

    from decimal import Decimal

    ckey = (
        F.col("tts").cast("decimal(38,0)") * F.lit(Decimal(_KEY_BASE))
        + F.col("touch_id")
    ).alias("ordkey")
    w = Window.partitionBy("conv_id")
    enriched = pairs.select(
        "conv_id", "touch", ckey
    ).select(
        "conv_id",
        "touch",
        "ordkey",
        F.count(F.lit(1)).over(w).alias("n"),
        F.min_by("touch", "ordkey").over(w).alias("first_touch"),
        F.max_by("touch", "ordkey").over(w).alias("last_touch"),
    )
    per_conv_type = enriched.groupBy("conv_id", "touch").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("n").alias("n"),
        F.first("first_touch").alias("ft"),
        F.first("last_touch").alias("lt"),
    )
    attributed = per_conv_type.groupBy(F.col("touch").alias("touch_type")).agg(
        F.count(F.when(F.col("ft") == F.col("touch"), F.lit(1))).alias(
            "first_touch"
        ),
        F.count(F.when(F.col("lt") == F.col("touch"), F.lit(1))).alias(
            "last_touch"
        ),
        F.sum(
            F.round(F.lit(1_000_000) * F.col("cnt") / F.col("n")).cast(
                "long"
            )
        ).alias("linear_units"),
    )
    unattributed = (
        convs.join(pairs.select("conv_id").distinct(), "conv_id", "anti")
        .agg(F.count(F.lit(1)).alias("n_un"))
        .select(
            F.lit(None).cast("string").alias("touch_type"),
            F.col("n_un").alias("first_touch"),
            F.col("n_un").alias("last_touch"),
            F.lit(0).cast("long").alias("linear_units"),
        )
        .filter(F.col("first_touch") > 0)
    )
    return attributed.unionByName(unattributed).select(
        "touch_type",
        "first_touch",
        "last_touch",
        "linear_units",
        (F.col("linear_units") / F.lit(1_000_000.0)).alias("linear_credit"),
    )


def attribution_oracle(
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`attribution` — the same pair predicate as
    a plain range join (DuckDB's optimizer handles it at oracle scale),
    the same composite ordering key via HUGEINT arg_min/arg_max, the
    same micro-credit rounding."""
    touch_list = ", ".join(f"'{t}'" for t in touch_types)
    lb_us = lookback_seconds * 1_000_000
    return f"""
        WITH convs AS (
            SELECT {key} AS k, epoch_us({ts_col}) AS cts,
                   {tie_col} AS conv_id
            FROM {table} WHERE {type_col} = '{conversion_type}'
        ),
        touches AS (
            SELECT {key} AS k, epoch_us({ts_col}) AS tts,
                   {type_col} AS touch, {tie_col} AS touch_id
            FROM {table} WHERE {type_col} IN ({touch_list})
        ),
        pairs AS (
            SELECT c.conv_id, t.touch,
                   CAST(t.tts AS HUGEINT) * {_KEY_BASE} + t.touch_id
                       AS ordkey
            FROM convs c JOIN touches t
              ON c.k = t.k
             AND t.tts < c.cts AND t.tts >= c.cts - {lb_us}
        ),
        per_conv AS (
            SELECT conv_id, COUNT(*) AS n,
                   arg_min(touch, ordkey) AS ft,
                   arg_max(touch, ordkey) AS lt
            FROM pairs GROUP BY conv_id
        ),
        per_conv_type AS (
            SELECT p.conv_id, p.touch, COUNT(*) AS cnt,
                   ANY_VALUE(c.n) AS n, ANY_VALUE(c.ft) AS ft,
                   ANY_VALUE(c.lt) AS lt
            FROM pairs p JOIN per_conv c USING (conv_id)
            GROUP BY p.conv_id, p.touch
        ),
        attributed AS (
            SELECT touch AS touch_type,
                   COUNT(CASE WHEN ft = touch THEN 1 END) AS first_touch,
                   COUNT(CASE WHEN lt = touch THEN 1 END) AS last_touch,
                   CAST(SUM(CAST(ROUND(1000000 * cnt / CAST(n AS DOUBLE))
                                 AS BIGINT)) AS BIGINT) AS linear_units
            FROM per_conv_type GROUP BY touch
        ),
        unattributed AS (
            SELECT CAST(NULL AS VARCHAR) AS touch_type,
                   COUNT(*) AS first_touch, COUNT(*) AS last_touch,
                   CAST(0 AS BIGINT) AS linear_units
            FROM convs
            WHERE conv_id NOT IN (SELECT conv_id FROM pairs)
            HAVING COUNT(*) > 0
        )
        SELECT touch_type, first_touch, last_touch, linear_units,
               linear_units / 1000000.0 AS linear_credit
        FROM (SELECT * FROM attributed
              UNION ALL SELECT * FROM unattributed)
    """


def asof_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """The PAIR-FREE full report — bit-identical to :func:`attribution`
    (all five columns, pinned in tests on fixtures and a randomized
    corpus), at a cost INDEPENDENT of the lookback.

    Why linear credit needs no pairs: per conversion, each channel's
    in-window touch count is a DIFFERENCE of that channel's running
    touch count at the window's two edges —
    ``|{tts < cts}| - |{tts < cts - lookback}|`` — so one user-keyed
    sort that carries a running count per channel, read at two marker
    rows per conversion, yields n and every per-channel count without
    materializing a single (conversion, touch) pair. The two
    positional models ride the SAME sort as as-of fills (the
    first_last_attribution machinery): last touch = forward fill read
    at the ``cts`` marker, first touch = backward fill read at the
    ``cts - lookback`` marker, both window-checked. Markers (tag 0)
    sort before same-microsecond touches (tag 1), which makes every
    boundary exact: the running count at ``cts`` excludes
    same-microsecond touches (strict <), the count at the left edge
    excludes boundary touches from the SUBTRACTED total (so they are
    in-window, >=), and the fills inherit the strict-< / >=-boundary
    rules identically.

    Plan shape: ONE user-keyed sort (both window frames share its
    exchange), then one conv-keyed aggregation over 2 rows per
    conversion, one bounded explode (|channels| rows per attributed
    conversion), and two small aggregations — NO join anywhere
    (pinned in the plan test; the pair path's equi-join and
    per-conv_id window are gone). Channel cardinality is the declared
    ``touch_types`` list (small, the module contract): each channel
    adds one running-count column to the sort, not a row blow-up.

    Cost law, measured (SCALE.md --attribution, quiet box): the pair
    path is conversions × in-window touches — 10.4 s at a 1 h lookback
    but 153 s at 24 h on the dense probe corpus; THIS form is flat
    (8.4 -> 13.3 s over the same sweep). Use the pair path only when
    pairs-per-conversion is known tiny; this form is the default
    recommendation for real streams."""
    per_conv, exploded, touch_types = _asof_conversion_stats(
        events,
        conversion_type,
        touch_types,
        lookback_seconds,
        key,
        ts_col,
        type_col,
        tie_col,
    )
    attributed = exploded.groupBy(F.col("touch").alias("touch_type")).agg(
        F.count(F.when(F.col("ft") == F.col("touch"), F.lit(1))).alias(
            "first_touch"
        ),
        F.count(F.when(F.col("lt") == F.col("touch"), F.lit(1))).alias(
            "last_touch"
        ),
        # the identical micro-credit expression as attribution() — the
        # bit-equality contract hangs on this being the same one
        # correctly-rounded double division
        F.sum(
            F.round(F.lit(1_000_000) * F.col("cnt") / F.col("n")).cast(
                "long"
            )
        ).alias("linear_units"),
    )
    unattributed = _unattributed_row(per_conv)
    return attributed.unionByName(unattributed).select(
        "touch_type",
        "first_touch",
        "last_touch",
        "linear_units",
        (F.col("linear_units") / F.lit(1_000_000.0)).alias("linear_credit"),
    )


def _asof_conversion_stats(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    lookback_seconds: int,
    key: str,
    ts_col: str,
    type_col: str,
    tie_col: str,
):
    """(per_conv, exploded, touch_types): the shared pair-free stage —
    per conversion: n, first/last picks, per-channel in-window counts
    (running-count differences at the window edges), plus the
    channel-exploded (conv_id, n, ft, lt, touch, cnt > 0) rows. One
    user-keyed sort; see :func:`asof_attribution` for the plan
    argument. Consumed by asof_attribution (linear) and
    position_attribution (U-shaped)."""
    touch_types = list(touch_types)
    if not touch_types:
        raise ValueError("attribution needs at least one touch type")
    if conversion_type in touch_types:
        raise ValueError(
            "conversion_type must not be one of touch_types "
            f"(got {conversion_type!r} in {touch_types})"
        )
    lb_us = lookback_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))

    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(key).alias("k"),
        us.alias("t"),
        F.lit(1).alias("tag"),
        F.col(tie_col).cast("long").alias("tie"),
        F.col(type_col).alias("touch"),
        F.struct(
            us.alias("tts"), F.col(type_col).alias("touch")
        ).alias("pay"),
    )
    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(key).alias("k"),
        us.alias("cts"),
        F.col(tie_col).alias("conv_id"),
    )
    pay_t = touches.schema["pay"].dataType
    # two marker rows per conversion: kind 1 at cts (right edge),
    # kind 0 at cts - lookback (left edge)
    markers = convs.select(
        "k",
        F.explode(
            F.array(
                F.struct(
                    F.col("cts").alias("t"), F.lit(1).alias("kind")
                ),
                F.struct(
                    (F.col("cts") - lb_us).alias("t"),
                    F.lit(0).alias("kind"),
                ),
            )
        ).alias("m"),
        "conv_id",
        "cts",
    ).select(
        "k",
        F.col("m.t").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("tie"),
        F.lit(None).cast("string").alias("touch"),
        F.lit(None).cast(pay_t).alias("pay"),
        F.col("m.kind").alias("kind"),
        "conv_id",
        "cts",
    )
    tagged = touches.select(
        "k",
        "t",
        "tag",
        "tie",
        "touch",
        "pay",
        F.lit(None).cast("int").alias("kind"),
        F.lit(None).cast(convs.schema["conv_id"].dataType).alias("conv_id"),
        F.lit(None).cast("long").alias("cts"),
    ).unionByName(markers)

    order = [F.col("t"), F.col("tag"), F.col("tie")]
    w_fwd = (
        Window.partitionBy("k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the backward fill ("first following non-null") runs as a RUNNING
    # fill over the REVERSED sort — never as a (currentRow,
    # unboundedFollowing) frame, which WindowExec evaluates by
    # re-scanning to the partition's end for EVERY row (O(rows^2) per
    # user; measured 4.5x the whole operator's cost on the dense probe
    # corpus before this form). Same exchange, one extra in-partition
    # sort.
    w_rev = (
        Window.partitionBy("k")
        .orderBy(
            F.col("t").desc(), F.col("tag").desc(), F.col("tie").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = [
        F.sum(
            F.when(F.col("touch") == F.lit(ch), F.lit(1))
        ).over(w_fwd).alias(f"c{i}")
        for i, ch in enumerate(touch_types)
    ]
    at_markers = (
        tagged.select(
            "*",
            *cums,
            F.last(F.col("pay"), ignorenulls=True).over(w_fwd).alias("lp"),
            F.last(F.col("pay"), ignorenulls=True).over(w_rev).alias("fp"),
        )
        .filter(F.col("tag") == 0)
        .select(
            "conv_id",
            "kind",
            *[F.coalesce(f"c{i}", F.lit(0)).alias(f"c{i}") for i in range(len(touch_types))],
            # window-checked positional picks, evaluated AT the marker
            F.when(
                (F.col("kind") == 1)
                & (F.col("lp.tts") >= F.col("cts") - lb_us),
                F.col("lp.touch"),
            ).alias("lt"),
            F.when(
                (F.col("kind") == 0) & (F.col("fp.tts") < F.col("cts")),
                F.col("fp.touch"),
            ).alias("ft"),
        )
    )
    per_conv = at_markers.groupBy("conv_id").agg(
        *[
            (
                F.max(F.when(F.col("kind") == 1, F.col(f"c{i}")))
                - F.max(F.when(F.col("kind") == 0, F.col(f"c{i}")))
            ).alias(f"cnt{i}")
            for i in range(len(touch_types))
        ],
        F.max("lt").alias("lt"),
        F.max("ft").alias("ft"),
    )
    n_expr = None
    for i in range(len(touch_types)):
        c = F.col(f"cnt{i}")
        n_expr = c if n_expr is None else n_expr + c
    per_conv = per_conv.withColumn("n", n_expr)

    exploded = (
        per_conv.filter(F.col("n") > 0)
        .select(
            "conv_id",
            "n",
            "ft",
            "lt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(ch).alias("touch"),
                            F.col(f"cnt{i}").alias("cnt"),
                        )
                        for i, ch in enumerate(touch_types)
                    ]
                )
            ).alias("e"),
        )
        .select(
            "conv_id",
            "n",
            "ft",
            "lt",
            F.col("e.touch").alias("touch"),
            F.col("e.cnt").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    return per_conv, exploded, touch_types


def _unattributed_row(per_conv: DataFrame) -> DataFrame:
    # The guard aggregates reference EVERY per_conv column (dropped by
    # the select below, so the output row is unchanged): without them,
    # column pruning strips the positional-fill windows (and, for the
    # decay model, the scaled-weight sums) from this branch's copy of
    # the per-conversion aggregation, the conv_id exchange child then
    # canonicalizes DIFFERENT from the attributed branch's, and the
    # whole scan -> user-keyed sort -> window pipeline executes twice
    # per report (measured at sf0.01: two input-scanning sort stages
    # per model; the r12 finding-3 duplicate-subtree class). With the
    # branches canonical, runtime exchange reuse executes it once —
    # at 100 TB that is one full pass over the events saved per model
    # (guide §2.1, remove redundant computation).
    # zero_guard is EXACTLY 0 on every input (min(hash)*0 is 0 on any
    # row set, NULL on the empty set, coalesced to 0) but Catalyst
    # cannot fold it away (x*0 is not constant-foldable under NULL
    # semantics), so the reference to every column survives pruning.
    zero_guard = F.coalesce(
        F.min(F.xxhash64(*[F.col(c) for c in per_conv.columns]))
        * F.lit(0),
        F.lit(0),
    ).cast("long")
    return (
        per_conv.filter(F.col("n") == 0)
        .agg(
            F.count(F.lit(1)).alias("n_un"),
            zero_guard.alias("_zero"),
        )
        .select(
            F.lit(None).cast("string").alias("touch_type"),
            F.col("n_un").alias("first_touch"),
            F.col("n_un").alias("last_touch"),
            F.col("_zero").alias("linear_units"),
        )
        .filter(F.col("first_touch") > 0)
    )


def position_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
    w_first: float = 0.4,
    w_last: float = 0.4,
) -> DataFrame:
    """(touch_type, first_touch, last_touch, position_units,
    position_credit): U-shaped / position-based attribution — the
    fourth standard model beside first/last/linear, pair-free on the
    same one-sort machinery as :func:`asof_attribution`.

    Credit per conversion with n in-window touch EVENTS (first/last =
    the same composite (ts, tie)-ordered picks as every other model
    here):

    - n = 1: the single event's channel gets 1.0 (not w_first +
      w_last — the standard single-touch rule);
    - n = 2: 0.5 to the first event's channel, 0.5 to the last's;
    - n >= 3: ``w_first`` to the first event, ``w_last`` to the last,
      and the remaining ``1 - w_first - w_last`` split evenly across
      the n - 2 middle events (a channel's middle count is its
      in-window count minus its first/last memberships).

    Exactness: per (conversion, channel) the credit is ONE
    deterministic double expression rounded once to integer
    MICRO-units (the module's exactmath rule, mirrored verbatim in
    :func:`position_attribution_oracle`); sums are exact BIGINTs and
    each attributed conversion's units total 1e6 ± one unit per
    channel. Unattributed conversions are the NULL row."""
    if w_first < 0 or w_last < 0:
        # individually negative weights can slip past the sum check
        # (w_first=-0.2, w_last=1.0) and yield negative credits
        raise ValueError(
            f"w_first and w_last must each be >= 0, got "
            f"({w_first}, {w_last})"
        )
    if not 0 <= w_first + w_last <= 1:
        raise ValueError(
            f"w_first + w_last must be in [0, 1], got {w_first + w_last}"
        )
    per_conv, exploded, touch_types = _asof_conversion_stats(
        events,
        conversion_type,
        touch_types,
        lookback_seconds,
        key,
        ts_col,
        type_col,
        tie_col,
    )
    is_f = (F.col("ft") == F.col("touch")).cast("int")
    is_l = (F.col("lt") == F.col("touch")).cast("int")
    w_mid = 1.0 - w_first - w_last
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(
            F.col("n") == 2,
            F.lit(0.5) * is_f + F.lit(0.5) * is_l,
        )
        .otherwise(
            F.lit(w_first) * is_f
            + F.lit(w_last) * is_l
            + F.lit(w_mid)
            * (F.col("cnt") - is_f - is_l)
            / (F.col("n") - 2)
        )
    )
    attributed = exploded.groupBy(F.col("touch").alias("touch_type")).agg(
        F.count(F.when(F.col("ft") == F.col("touch"), F.lit(1))).alias(
            "first_touch"
        ),
        F.count(F.when(F.col("lt") == F.col("touch"), F.lit(1))).alias(
            "last_touch"
        ),
        F.sum(
            F.round(F.lit(1_000_000) * credit).cast("long")
        ).alias("position_units"),
    )
    unattributed = _unattributed_row(per_conv).withColumnRenamed(
        "linear_units", "position_units"
    )
    return attributed.unionByName(unattributed).select(
        "touch_type",
        "first_touch",
        "last_touch",
        "position_units",
        (F.col("position_units") / F.lit(1_000_000.0)).alias(
            "position_credit"
        ),
    )


def position_attribution_oracle(
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
    w_first: float = 0.4,
    w_last: float = 0.4,
) -> str:
    """DuckDB twin of :func:`position_attribution` — the PAIR path
    (conversions x touches range join), entirely independent of the
    as-of machinery, with the identical single-rounding micro-unit
    expression."""
    touch_list = ", ".join(f"'{t}'" for t in touch_types)
    lb_us = lookback_seconds * 1_000_000
    w_mid = 1.0 - w_first - w_last
    return f"""
        WITH convs AS (
            SELECT {key} AS k, epoch_us({ts_col}) AS cts,
                   {tie_col} AS conv_id
            FROM {table} WHERE {type_col} = '{conversion_type}'
        ),
        touches AS (
            SELECT {key} AS k, epoch_us({ts_col}) AS tts,
                   {type_col} AS touch, {tie_col} AS touch_id
            FROM {table} WHERE {type_col} IN ({touch_list})
        ),
        pairs AS (
            SELECT c.conv_id, t.touch,
                   CAST(t.tts AS HUGEINT) * {_KEY_BASE} + t.touch_id
                       AS ordkey
            FROM convs c JOIN touches t
              ON c.k = t.k
             AND t.tts < c.cts AND t.tts >= c.cts - {lb_us}
        ),
        per_conv AS (
            SELECT conv_id, COUNT(*) AS n,
                   arg_min(touch, ordkey) AS ft,
                   arg_max(touch, ordkey) AS lt
            FROM pairs GROUP BY conv_id
        ),
        per_conv_type AS (
            SELECT p.conv_id, p.touch, COUNT(*) AS cnt,
                   ANY_VALUE(c.n) AS n, ANY_VALUE(c.ft) AS ft,
                   ANY_VALUE(c.lt) AS lt
            FROM pairs p JOIN per_conv c USING (conv_id)
            GROUP BY p.conv_id, p.touch
        ),
        credited AS (
            SELECT conv_id, touch, ft, lt,
                   -- every literal CAST to DOUBLE: DuckDB parses a
                   -- bare 0.4 as DECIMAL, whose exact arithmetic
                   -- would diverge from Spark's IEEE doubles at the
                   -- micro-unit rounding boundary
                   CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
                        WHEN n = 2 THEN
                            CAST(0.5 AS DOUBLE)
                              * (CASE WHEN ft = touch THEN 1 ELSE 0 END)
                          + CAST(0.5 AS DOUBLE)
                              * (CASE WHEN lt = touch THEN 1 ELSE 0 END)
                        ELSE
                            CAST({w_first!r} AS DOUBLE)
                              * (CASE WHEN ft = touch THEN 1 ELSE 0 END)
                          + CAST({w_last!r} AS DOUBLE)
                              * (CASE WHEN lt = touch THEN 1 ELSE 0 END)
                          + CAST({w_mid!r} AS DOUBLE) * (cnt
                                - (CASE WHEN ft = touch THEN 1 ELSE 0 END)
                                - (CASE WHEN lt = touch THEN 1 ELSE 0 END))
                            / CAST(n - 2 AS DOUBLE)
                   END AS credit
            FROM per_conv_type
        ),
        attributed AS (
            SELECT touch AS touch_type,
                   COUNT(CASE WHEN ft = touch THEN 1 END) AS first_touch,
                   COUNT(CASE WHEN lt = touch THEN 1 END) AS last_touch,
                   CAST(SUM(CAST(ROUND(1000000 * credit) AS BIGINT))
                        AS BIGINT) AS position_units
            FROM credited GROUP BY touch
        ),
        unattributed AS (
            SELECT CAST(NULL AS VARCHAR) AS touch_type,
                   COUNT(*) AS first_touch, COUNT(*) AS last_touch,
                   CAST(0 AS BIGINT) AS position_units
            FROM convs
            WHERE conv_id NOT IN (SELECT conv_id FROM pairs)
            HAVING COUNT(*) > 0
        )
        SELECT touch_type, first_touch, last_touch, position_units,
               position_units / 1000000.0 AS position_credit
        FROM (SELECT * FROM attributed
              UNION ALL SELECT * FROM unattributed)
    """


def first_last_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """(touch_type, first_touch, last_touch): the PAIR-FREE fast path
    for the two positional models — bit-identical to
    :func:`attribution`'s first/last columns (pinned in tests), at a
    cost INDEPENDENT of the lookback.

    Why it exists (measured, SCALE.md): the pair path's cost is the
    conversion × in-window-touch pair count — pure waste for
    first/last — and grows with the lookback; this form costs two
    user-keyed sort windows over the attribution-typed events,
    INDEPENDENT of the lookback. Since r10, :func:`asof_attribution`
    subsumes the old crossover guidance: it delivers the FULL report
    (linear included) pair-free on one sort, so the only reason to
    call THIS function is wanting the positional-only report with its
    declared-channel zero-filled row shape. Both positional models
    are as-of questions and fold without materializing any pair:

    - last touch  = the latest touch STRICTLY before the conversion
      (asof.py's union-tag forward fill; the conversion row sorts
      before same-microsecond touches, so strict-< falls out of the
      tag order), window-checked against ``cts - lookback``;
    - first touch = the earliest touch AT-OR-AFTER the window's left
      boundary — the mirrored as-of: one boundary row per conversion
      at ``cts - lookback``, a BACKWARD fill (first following touch),
      checked against ``< cts``.

    Two user-keyed sort windows total; no join, no explosion. Ties on
    the same microsecond break by ``tie_col`` exactly as the full
    operator's composite key (largest id wins last-touch, smallest
    wins first-touch). Unattributed conversions are the NULL row, as
    in :func:`attribution`."""
    touch_types = list(touch_types)
    if not touch_types:
        raise ValueError("attribution needs at least one touch type")
    if conversion_type in touch_types:
        raise ValueError(
            "conversion_type must not be one of touch_types "
            f"(got {conversion_type!r} in {touch_types})"
        )
    lb_us = lookback_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(key).alias("k"),
        us.alias("t"),
        F.col(tie_col).alias("tie"),
        F.struct(
            us.alias("tts"), F.col(type_col).alias("touch")
        ).alias("pay"),
    )
    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(key).alias("k"),
        us.alias("cts"),
        F.col(tie_col).alias("conv_id"),
    )
    pay_t = touches.schema["pay"].dataType

    def _fill(boundary_time, backward: bool):
        tagged_c = convs.select(
            "k",
            boundary_time.alias("t"),
            F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("tie"),
            F.lit(None).cast(pay_t).alias("pay"),
            "conv_id",
            "cts",
        )
        tagged_t = touches.select(
            "k",
            "t",
            F.lit(1).alias("tag"),
            F.col("tie").cast("long").alias("tie"),
            "pay",
            F.lit(None).cast(convs.schema["conv_id"].dataType).alias(
                "conv_id"
            ),
            F.lit(None).cast("long").alias("cts"),
        )
        u = tagged_c.unionByName(tagged_t)
        if backward:
            # "first following non-null" as a RUNNING fill over the
            # REVERSED sort — a (currentRow, unboundedFollowing) frame
            # re-scans to the partition end per row in WindowExec
            # (O(rows^2) per user; the asof_attribution lesson, r10)
            w = (
                Window.partitionBy("k")
                .orderBy(
                    F.col("t").desc(),
                    F.col("tag").desc(),
                    F.col("tie").desc(),
                )
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            fill = F.last(F.col("pay"), ignorenulls=True).over(w)
        else:
            w = (
                Window.partitionBy("k")
                .orderBy("t", "tag", "tie")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            fill = F.last(F.col("pay"), ignorenulls=True).over(w)
        return (
            u.select("tag", "conv_id", "cts", fill.alias("pay"))
            .filter(F.col("tag") == 0)
            .select("conv_id", "cts", "pay")
        )

    # last touch: conversion rows sit AT cts; tag 0 sorts before
    # same-time touches, so the backward-looking fill is strictly-<
    last = _fill(F.col("cts"), backward=False).select(
        "conv_id",
        F.when(
            F.col("pay.tts") >= F.col("cts") - lb_us, F.col("pay.touch")
        ).alias("lt"),
    )
    # first touch: boundary rows sit AT cts - lookback; tag 0 sorts
    # before same-time touches, so a touch exactly at the boundary is
    # inside the forward-looking fill (>= boundary)
    first = _fill(F.col("cts") - lb_us, backward=True).select(
        "conv_id",
        F.when(
            F.col("pay.tts") < F.col("cts"), F.col("pay.touch")
        ).alias("ft"),
    )
    per_conv = last.join(first, "conv_id")
    ft_counts = per_conv.groupBy(F.col("ft").alias("ftt")).agg(
        F.count(F.lit(1)).alias("first_touch")
    )
    lt_counts = per_conv.groupBy(F.col("lt").alias("ltt")).agg(
        F.count(F.lit(1)).alias("last_touch")
    )
    # one row per DECLARED channel (a pair-free plan cannot know which
    # channels merely HAD in-window touches — the full operator's
    # zero-credit rows — so this report's row set is the declared
    # channel list, zero-filled, plus the NULL unattributed row),
    # null-safe joins: the unattributed key IS NULL on both sides
    spark = events.sparkSession
    from ..litframe import literal_frame

    channels = literal_frame(
        spark, [(t,) for t in touch_types] + [(None,)], "ct STRING"
    )
    joined = (
        channels.join(
            ft_counts, F.col("ct").eqNullSafe(F.col("ftt")), "left"
        )
        .join(lt_counts, F.col("ct").eqNullSafe(F.col("ltt")), "left")
    )
    out = joined.select(
        F.col("ct").alias("touch_type"),
        F.coalesce("first_touch", F.lit(0)).alias("first_touch"),
        F.coalesce("last_touch", F.lit(0)).alias("last_touch"),
    )
    # the NULL row only when unattributed conversions exist (the full
    # operator's rule)
    return out.filter(
        F.col("touch_type").isNotNull() | (F.col("first_touch") > 0)
    )


# --- time-decay (half-life) attribution ----------------------------------------


def _decay_buckets(lookback_seconds: int, half_life_seconds: int) -> int:
    """K = lookback / half_life decay buckets. The contract demands an
    integer K (markers sit at cts - j*half_life; the j = K marker IS
    the window's left edge) and K <= 52 (per-channel scaled weights
    are exact BIGINTs: sum of counts x 2^(K-1-j) stays far under
    2^63, and every weight ratio is exactly representable)."""
    if half_life_seconds <= 0:
        raise ValueError(
            f"half_life_seconds must be > 0, got {half_life_seconds}"
        )
    if lookback_seconds % half_life_seconds != 0:
        raise ValueError(
            "time-decay attribution needs lookback divisible by the "
            f"half-life (got {lookback_seconds}s / {half_life_seconds}s): "
            "the j-th decay marker sits at cts - j*half_life and the "
            "last one must BE the window's left edge"
        )
    k = lookback_seconds // half_life_seconds
    if not 1 <= k <= 52:
        raise ValueError(
            f"lookback/half_life = {k} decay buckets outside [1, 52] — "
            "above 52 the scaled dyadic weights leave the exact-BIGINT "
            "range (and a touch 52 half-lives old carries < 2^-52 "
            "credit: widen the half-life instead)"
        )
    return k


def time_decay_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    half_life_seconds: int = 86_400,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """(touch_type, first_touch, last_touch, decay_units,
    decay_credit): half-life time-decay attribution — the fifth
    standard model, pair-free on the as-of machinery, with an EXACT
    dyadic-weight contract.

    Semantics: a touch at age ``cts - tts`` in bucket
    ``j = ceil(age / half_life) - 1`` (age in ``(j*H, (j+1)*H]`` —
    integer microseconds, so ``j = (age - 1) div H`` exactly in both
    engines) carries raw weight ``2^-j``: under one half-life old →
    1, one-to-two half-lives → 1/2, and so on. Per conversion, each
    channel's credit share is its raw-weight sum over the total —
    normalized, so every attributed conversion distributes exactly
    1e6 micro-units (± one per channel from the single rounding).

    Exactness (the DESIGN.md dyadic criterion): scaling by
    ``2^(K-1)`` (K = lookback/half_life <= 52) turns every raw-weight
    sum into an exact BIGINT ``S_c = sum_j cnt_{c,j} * 2^(K-1-j)``
    (bit-shift arithmetic, no floating point); the share is then ONE
    double division of two exact integers and the micro-units ONE
    round — ``ROUND(1e6 * (S_c / S))`` — the identical
    correctly-rounded expression in the DuckDB twin (every literal
    CAST to DOUBLE, the r10 exactness rule). Additive per conversion:
    each conversion's channel units are a pure function of its own
    window, so report rows sum across any partition of the conversion
    set (pinned — the fin-store additivity criterion).

    Plan shape: the asof_attribution argument generalized — ONE
    user-keyed sort carrying a running count per channel, read at
    K+1 marker rows per conversion (``cts - j*H``, j = 0..K; the
    j = K marker is the left edge, so the two positional fills ride
    the same rows); bucket counts are running-count DIFFERENCES of
    adjacent markers. NO join.

    ROUTING, measured (SCALE.md round-11, 20M-event probe corpus):
    this form's cost is the (K+1) x conversions marker fan-out
    through the user sort — K-proportional, lookback-INDEPENDENT in
    touch volume; the pair twin's cost is conversions x in-window
    touches — lookback-proportional, K-independent. At the DEFAULT
    config (7-day lookback / 1-day half-life, K=7) this form measured
    21.6 s vs 416 s for pairs (~19x): windows hold hundreds of
    touches and K is small. The pair twin wins only when K exceeds
    the per-window touch count — short-lookback fine-half-life
    configs (1h/6min K=10: pairs 8 s vs 72 s; 24h/1h K=24: pairs
    47 s vs 149 s). Rule of thumb: call THIS form when in-window
    touches per conversion >> K, the pair twin otherwise."""
    touch_types = list(touch_types)
    if not touch_types:
        raise ValueError("attribution needs at least one touch type")
    if conversion_type in touch_types:
        raise ValueError(
            "conversion_type must not be one of touch_types "
            f"(got {conversion_type!r} in {touch_types})"
        )
    kbuckets = _decay_buckets(lookback_seconds, half_life_seconds)
    h_us = half_life_seconds * 1_000_000
    lb_us = lookback_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))

    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(key).alias("k"),
        us.alias("t"),
        F.lit(1).alias("tag"),
        F.col(tie_col).cast("long").alias("tie"),
        F.col(type_col).alias("touch"),
        F.struct(
            us.alias("tts"), F.col(type_col).alias("touch")
        ).alias("pay"),
    )
    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(key).alias("k"),
        us.alias("cts"),
        F.col(tie_col).alias("conv_id"),
    )
    pay_t = touches.schema["pay"].dataType
    # K+1 markers per conversion: kind j at cts - j*half_life
    markers = convs.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cts") - j * h_us).alias("t"),
                        F.lit(j).alias("kind"),
                    )
                    for j in range(kbuckets + 1)
                ]
            )
        ).alias("m"),
        "conv_id",
        "cts",
    ).select(
        "k",
        F.col("m.t").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("tie"),
        F.lit(None).cast("string").alias("touch"),
        F.lit(None).cast(pay_t).alias("pay"),
        F.col("m.kind").alias("kind"),
        "conv_id",
        "cts",
    )
    tagged = touches.select(
        "k",
        "t",
        "tag",
        "tie",
        "touch",
        "pay",
        F.lit(None).cast("int").alias("kind"),
        F.lit(None).cast(convs.schema["conv_id"].dataType).alias("conv_id"),
        F.lit(None).cast("long").alias("cts"),
    ).unionByName(markers)

    order = [F.col("t"), F.col("tag"), F.col("tie")]
    w_fwd = (
        Window.partitionBy("k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # backward fill as a RUNNING fill over the REVERSED sort — the
    # unbounded-FOLLOWING frame is the linted O(rows^2) class
    w_rev = (
        Window.partitionBy("k")
        .orderBy(
            F.col("t").desc(), F.col("tag").desc(), F.col("tie").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = [
        F.sum(
            F.when(F.col("touch") == F.lit(ch), F.lit(1))
        ).over(w_fwd).alias(f"c{i}")
        for i, ch in enumerate(touch_types)
    ]
    at_markers = (
        tagged.select(
            "*",
            *cums,
            F.last(F.col("pay"), ignorenulls=True).over(w_fwd).alias("lp"),
            F.last(F.col("pay"), ignorenulls=True).over(w_rev).alias("fp"),
        )
        .filter(F.col("tag") == 0)
        .select(
            "conv_id",
            "kind",
            *[
                F.coalesce(f"c{i}", F.lit(0)).alias(f"c{i}")
                for i in range(len(touch_types))
            ],
            # positional picks at the window edges (kind 0 = cts,
            # kind K = left edge), window-checked as in the 2-marker
            # machinery
            F.when(
                (F.col("kind") == 0)
                & (F.col("lp.tts") >= F.col("cts") - lb_us),
                F.col("lp.touch"),
            ).alias("lt"),
            F.when(
                (F.col("kind") == kbuckets)
                & (F.col("fp.tts") < F.col("cts")),
                F.col("fp.touch"),
            ).alias("ft"),
        )
    )
    # per conversion: per-channel PER-BUCKET counts as adjacent-marker
    # differences, immediately folded into the exact scaled weight
    # S_i = sum_j cnt_{i,j} * 2^(K-1-j)  (BIGINT bit-shifts).
    # Plan note (measured, SCALE.md --attribution): this
    # channels x (K+1) conditional-max aggregation partial-
    # aggregates MAP-SIDE (one row per conversion crosses the
    # exchange) and beat both alternatives tried — a lead()-over-
    # kind window (forfeits the partial aggregation: every marker
    # row shuffles) and a collect_list + aggregate() lambda fold
    # (same shuffle win but slower codegen than the flat
    # conditional maxes at these K) — the operator is dominated
    # by the (K+1) x conversions marker fan-out through the
    # user-keyed sort either way, which is what the pair-path
    # routing below is for.
    cnt_at = {
        (i, j): F.max(
            F.when(F.col("kind") == j, F.col(f"c{i}"))
        )
        for i in range(len(touch_types))
        for j in range(kbuckets + 1)
    }
    s_exprs = []
    n_exprs = []
    for i in range(len(touch_types)):
        s_i = None
        for j in range(kbuckets):
            d = (cnt_at[(i, j)] - cnt_at[(i, j + 1)]).cast("long")
            term = d * F.lit(1 << (kbuckets - 1 - j)).cast("long")
            s_i = term if s_i is None else s_i + term
        s_exprs.append(s_i.alias(f"s{i}"))
        n_exprs.append(
            (cnt_at[(i, 0)] - cnt_at[(i, kbuckets)]).cast("long")
        )
    n_expr = None
    for e in n_exprs:
        n_expr = e if n_expr is None else n_expr + e
    per_conv = at_markers.groupBy("conv_id").agg(
        *s_exprs,
        n_expr.alias("n"),
        F.max("lt").alias("lt"),
        F.max("ft").alias("ft"),
    )
    s_total = None
    for i in range(len(touch_types)):
        c = F.col(f"s{i}")
        s_total = c if s_total is None else s_total + c
    per_conv = per_conv.withColumn("s", s_total)

    exploded = (
        per_conv.filter(F.col("n") > 0)
        .select(
            "conv_id",
            "n",
            "s",
            "ft",
            "lt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(ch).alias("touch"),
                            F.col(f"s{i}").alias("sc"),
                        )
                        for i, ch in enumerate(touch_types)
                    ]
                )
            ).alias("e"),
        )
        .select(
            "conv_id",
            "n",
            "s",
            "ft",
            "lt",
            F.col("e.touch").alias("touch"),
            F.col("e.sc").alias("sc"),
        )
        .filter(F.col("sc") > 0)
    )
    # ONE double division of two exact BIGINTs, ONE round — mirrored
    # verbatim (operand order included) in the DuckDB twin
    units = F.round(
        F.lit(1_000_000.0)
        * (F.col("sc").cast("double") / F.col("s").cast("double"))
    ).cast("long")
    attributed = exploded.groupBy(F.col("touch").alias("touch_type")).agg(
        F.count(F.when(F.col("ft") == F.col("touch"), F.lit(1))).alias(
            "first_touch"
        ),
        F.count(F.when(F.col("lt") == F.col("touch"), F.lit(1))).alias(
            "last_touch"
        ),
        F.sum(units).alias("decay_units"),
    )
    unattributed = _unattributed_row(per_conv).withColumnRenamed(
        "linear_units", "decay_units"
    )
    return attributed.unionByName(unattributed).select(
        "touch_type",
        "first_touch",
        "last_touch",
        "decay_units",
        (F.col("decay_units") / F.lit(1_000_000.0)).alias("decay_credit"),
    )


def time_decay_attribution_pairs(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    half_life_seconds: int = 86_400,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Brute-force PAIR-path twin of :func:`time_decay_attribution` —
    materializes every (conversion, in-window touch) pair and buckets
    each age directly (``j = (age - 1) div H``), entirely independent
    of the marker algebra; the bit-equality pin between the two is
    what proves the running-count differences compute the same bucket
    histogram. Costs conversions x in-window touches — a test/oracle
    twin, not the routed form."""
    touch_types = list(touch_types)
    if not touch_types:
        raise ValueError("attribution needs at least one touch type")
    kbuckets = _decay_buckets(lookback_seconds, half_life_seconds)
    h_us = half_life_seconds * 1_000_000
    lb_us = lookback_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))

    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(key).alias("k"),
        us.alias("cts"),
        F.col(tie_col).alias("conv_id"),
    )
    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(key).alias("k"),
        us.alias("tts"),
        F.col(type_col).alias("touch"),
        F.col(tie_col).alias("touch_id"),
        F.expr(f"(unix_micros({ts_col})) div {lb_us}").alias("b"),
    )
    probes = convs.select(
        "k",
        "cts",
        "conv_id",
        F.explode(
            F.array(
                F.expr(f"cts div {lb_us}"), F.expr(f"cts div {lb_us}") - 1
            )
        ).alias("b"),
    )
    pairs = probes.join(touches, ["k", "b"]).filter(
        (F.col("tts") < F.col("cts"))
        & (F.col("tts") >= F.col("cts") - lb_us)
    )
    from decimal import Decimal

    ckey = (
        F.col("tts").cast("decimal(38,0)") * F.lit(Decimal(_KEY_BASE))
        + F.col("touch_id")
    ).alias("ordkey")
    weighted = pairs.select(
        "conv_id",
        "touch",
        ckey,
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({kbuckets - 1}"
            f" - ((cts - tts - 1) div {h_us}) AS INT))"
        ).alias("w"),
    )
    w = Window.partitionBy("conv_id")
    enriched = weighted.select(
        "conv_id",
        "touch",
        "w",
        F.min_by("touch", "ordkey").over(w).alias("ft"),
        F.max_by("touch", "ordkey").over(w).alias("lt"),
        F.sum("w").over(w).alias("s"),
    )
    per_ct = enriched.groupBy("conv_id", "touch").agg(
        F.sum("w").alias("sc"),
        F.first("s").alias("s"),
        F.first("ft").alias("ft"),
        F.first("lt").alias("lt"),
    )
    units = F.round(
        F.lit(1_000_000.0)
        * (F.col("sc").cast("double") / F.col("s").cast("double"))
    ).cast("long")
    attributed = per_ct.groupBy(F.col("touch").alias("touch_type")).agg(
        F.count(F.when(F.col("ft") == F.col("touch"), F.lit(1))).alias(
            "first_touch"
        ),
        F.count(F.when(F.col("lt") == F.col("touch"), F.lit(1))).alias(
            "last_touch"
        ),
        F.sum(units).alias("decay_units"),
    )
    unattributed = (
        convs.join(pairs.select("conv_id").distinct(), "conv_id", "anti")
        .agg(F.count(F.lit(1)).alias("n_un"))
        .select(
            F.lit(None).cast("string").alias("touch_type"),
            F.col("n_un").alias("first_touch"),
            F.col("n_un").alias("last_touch"),
            F.lit(0).cast("long").alias("decay_units"),
        )
        .filter(F.col("first_touch") > 0)
    )
    return attributed.unionByName(unattributed).select(
        "touch_type",
        "first_touch",
        "last_touch",
        "decay_units",
        (F.col("decay_units") / F.lit(1_000_000.0)).alias("decay_credit"),
    )


def time_decay_attribution_oracle(
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    half_life_seconds: int = 86_400,
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`time_decay_attribution` — the pair path
    with pure-integer bucket arithmetic (``(age - 1) // H``), exact
    BIGINT bit-shift weights, and the identical single-rounded
    micro-unit expression with every literal CAST to DOUBLE (the r10
    exactness rule)."""
    kbuckets = _decay_buckets(lookback_seconds, half_life_seconds)
    touch_list = ", ".join(f"'{t}'" for t in touch_types)
    lb_us = lookback_seconds * 1_000_000
    h_us = half_life_seconds * 1_000_000
    return f"""
        WITH convs AS (
            SELECT {key} AS k, epoch_us({ts_col}) AS cts,
                   {tie_col} AS conv_id
            FROM {table} WHERE {type_col} = '{conversion_type}'
        ),
        touches AS (
            SELECT {key} AS k, epoch_us({ts_col}) AS tts,
                   {type_col} AS touch, {tie_col} AS touch_id
            FROM {table} WHERE {type_col} IN ({touch_list})
        ),
        pairs AS (
            SELECT c.conv_id, t.touch,
                   CAST(t.tts AS HUGEINT) * {_KEY_BASE} + t.touch_id
                       AS ordkey,
                   CAST(1 AS BIGINT) << CAST(
                       {kbuckets - 1} - (c.cts - t.tts - 1) // {h_us}
                       AS INT) AS w
            FROM convs c JOIN touches t
              ON c.k = t.k
             AND t.tts < c.cts AND t.tts >= c.cts - {lb_us}
        ),
        per_conv AS (
            SELECT conv_id, SUM(w) AS s,
                   arg_min(touch, ordkey) AS ft,
                   arg_max(touch, ordkey) AS lt
            FROM pairs GROUP BY conv_id
        ),
        per_conv_type AS (
            SELECT p.conv_id, p.touch, SUM(p.w) AS sc,
                   ANY_VALUE(c.s) AS s, ANY_VALUE(c.ft) AS ft,
                   ANY_VALUE(c.lt) AS lt
            FROM pairs p JOIN per_conv c USING (conv_id)
            GROUP BY p.conv_id, p.touch
        ),
        attributed AS (
            SELECT touch AS touch_type,
                   COUNT(CASE WHEN ft = touch THEN 1 END) AS first_touch,
                   COUNT(CASE WHEN lt = touch THEN 1 END) AS last_touch,
                   CAST(SUM(CAST(ROUND(CAST(1000000.0 AS DOUBLE)
                        * (CAST(sc AS DOUBLE) / CAST(s AS DOUBLE)))
                        AS BIGINT)) AS BIGINT) AS decay_units
            FROM per_conv_type GROUP BY touch
        ),
        unattributed AS (
            SELECT CAST(NULL AS VARCHAR) AS touch_type,
                   COUNT(*) AS first_touch, COUNT(*) AS last_touch,
                   CAST(0 AS BIGINT) AS decay_units
            FROM convs
            WHERE conv_id NOT IN (SELECT conv_id FROM pairs)
            HAVING COUNT(*) > 0
        )
        SELECT touch_type, first_touch, last_touch, decay_units,
               decay_units / 1000000.0 AS decay_credit
        FROM (SELECT * FROM attributed
              UNION ALL SELECT * FROM unattributed)
    """
