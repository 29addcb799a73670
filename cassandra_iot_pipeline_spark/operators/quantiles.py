"""DDSketch quantiles — mergeable relative-error quantile summaries
over arbitrary double domains (Masson, Rim, Lee: "DDSketch: a fast and
fully-mergeable quantile sketch with relative-error guarantees",
VLDB 2019 — public algorithm, re-implemented from the paper).

Where it sits among the engine's quantile tools, honestly:

- ``stats.value_quantiles`` / ``median_from_counts``: EXACT, but only
  for fixed-precision measures (the integer-unit grid bounds state by
  the value DOMAIN);
- ``percentile_approx``: Spark-native, but its state lives inside one
  query — not a mergeable store a batch reader can fold;
- THIS module: any positive/negative/zero double, state bounded by the
  value RANGE RATIO (log-gamma buckets: ~1.4k buckets per group for
  alpha = 1 % across six decades), counts sum-mergeable across epochs,
  and every estimate within ``alpha`` RELATIVE error of the true
  quantile — the guarantee rank-based sketches (KLL) cannot give and
  the one that matters for long-tailed latencies/sizes. The opt-in
  ``max_buckets`` collapsing tier (:func:`collapse_sketch`, the
  paper's collapse rule) upgrades that to a FIXED per-group bound —
  the defense against an adversarial long-tail group (a poisoned
  sensor spanning hundreds of decades), which at 100 TB is a skew
  key; the alpha contract then holds for every quantile above the
  reported collapsed fraction.

Bucketing: for x > 0, index = ceil(log(x) / log(gamma)) with
``gamma = (1 + alpha) / (1 - alpha)``; bucket i spans
(gamma^(i-1), gamma^i] and its midpoint estimate 2*gamma^i/(gamma+1)
is within alpha of every value in it. Negatives mirror into a sign
lane on |x|; exact zeros get their own lane (returned exactly).
Boundary note, stated: the index arithmetic is IEEE log/div — a value
within 1 ulp of a bucket boundary may land one bucket over, which
stretches the error for THAT value by at most one gamma step; the
same projection runs everywhere, so stream ≡ batch stays exact
same-engine.

Exactness contract: deliberately approximate — REFUSES a DuckDB
oracle (the HLL/CMS refusal precedent). The pytest gates are
same-engine: streamed ≡ one-pass batch sketches exactly, the alpha
bound against exact percentiles on randomized data, merge/replay/
compaction invariance.

Plan shape: the sketch is ONE map-side-combined aggregation (bucket
index is a scan projection); quantile reads are one window cumsum
over the per-group buckets (bucket-bounded rows, never
value-proportional).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gamma(alpha: float) -> float:
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return (1 + alpha) / (1 - alpha)


def dd_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.01,
    max_buckets: int | None = None,
) -> DataFrame:
    """(group..., sgn, idx, cnt): the populated DDSketch buckets per
    group — ``sgn`` in (-1, 0, 1), ``idx`` the log-gamma bucket of
    |value| (0 for the zero lane). Merge two sketches by summing cnt
    per (group, sgn, idx) — tested associative. ``max_buckets``
    enables the FIXED-memory collapsing tier
    (:func:`collapse_sketch`): at most that many rows per group, the
    alpha contract intact above the collapsed mass."""
    g = _gamma(alpha)
    lg = math.log(g)
    groups = list(group_cols)
    v = F.col(value_col).cast("double")
    sgn = F.when(v > 0, 1).when(v < 0, -1).otherwise(0)
    idx = F.when(
        v == 0, F.lit(0)
    ).otherwise(F.ceil(F.log(F.abs(v)) / F.lit(lg)))
    sk = (
        df.filter(v.isNotNull())
        .select(
            *groups,
            sgn.cast("int").alias("sgn"),
            idx.cast("long").alias("idx"),
        )
        .groupBy(*groups, "sgn", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if max_buckets is not None:
        sk = collapse_sketch(sk, groups, max_buckets)
    return sk


def collapse_sketch(
    sketch: DataFrame,
    group_cols: Sequence[str],
    max_buckets: int,
    extra_sums: Sequence[str] = (),
) -> DataFrame:
    """The paper's collapsing tier: fold the sketch, then merge each
    group's LOWEST-value buckets into one floor bucket so at most
    ``max_buckets`` rows remain per group — the fixed-memory guarantee
    the plain sketch lacks (its state is bounded by the value RANGE
    RATIO, which an adversarial long-tail group — a broken sensor
    emitting subnormal-to-1e300 values — can stretch to ~70k buckets;
    at 100 TB such a poisoned group is a skew key). The floor bucket
    keeps the K-th-highest label; every quantile whose rank lands
    ABOVE the collapsed mass retains the full alpha relative-error
    contract, and a rank inside it returns the floor bucket's estimate
    (error unbounded there — the paper's stated trade, reported via
    ``collapsed_frac`` in the read).

    MERGE-INVARIANT under any fold tree (pinned in tests):
    ``collapse(collapse(A) + B) == collapse(A + B)`` bitwise, because
    collapse only ever moves mass UP to a label at or below the final
    floor — the final floor is the K-th-highest label of the union,
    which is >= every constituent's floor, so labels strictly above it
    were never touched by any earlier collapse and the mass below it
    sums identically however it was previously grouped. That is what
    lets the streaming store land collapsed epoch deltas, tail-fold
    them, and still read bitwise-equal to the one-pass batch sketch.

    ``extra_sums`` names additional per-bucket SUM columns that ride
    the collapse (e.g. the additive funnel tier's exact per-bucket
    ``sum_delta``): collapse only ever re-groups rows, so any additive
    column folds under the identical regrouping and the
    merge-invariance argument above applies to it verbatim."""
    if max_buckets < 2:
        raise ValueError(f"max_buckets must be >= 2, got {max_buckets}")
    groups = list(group_cols)
    extras = [F.sum(c).alias(c) for c in extra_sums]
    folded = sketch.groupBy(*groups, "sgn", "idx").agg(
        F.sum("cnt").alias("cnt"), *extras
    )
    ordk = (
        F.col("sgn").cast("long") * F.lit(2**40)
        + F.col("sgn") * F.col("idx")
    ).alias("ordk")
    w_rn = Window.partitionBy(*groups).orderBy(F.desc("ordk"))
    w_all = w_rn.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = folded.select(
        *groups, "sgn", "idx", "cnt", *extra_sums, ordk
    ).select(
        "*",
        F.row_number().over(w_rn).alias("rn"),
        # the floor label = the max_buckets-th highest (NULL when the
        # group is under the cap — then rn >= max_buckets never holds)
        F.nth_value("sgn", max_buckets).over(w_all).alias("fs"),
        F.nth_value("idx", max_buckets).over(w_all).alias("fi"),
    )
    at_floor = F.col("rn") >= max_buckets
    return (
        ranked.select(
            *groups,
            F.when(at_floor, F.col("fs")).otherwise(F.col("sgn")).alias(
                "sgn"
            ),
            F.when(at_floor, F.col("fi")).otherwise(F.col("idx")).alias(
                "idx"
            ),
            "cnt",
            *extra_sums,
        )
        .groupBy(*groups, "sgn", "idx")
        .agg(
            F.sum("cnt").alias("cnt"),
            *[F.sum(c).alias(c) for c in extra_sums],
        )
    )


def dd_quantiles_from_sketch(
    sketch: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    alpha: float = 0.01,
    max_buckets: int | None = None,
) -> DataFrame:
    """(group..., q, est): quantile estimates from folded buckets.
    Rank convention: the estimate for q is the bucket holding the
    ``max(1, ceil(q * n))``-th smallest value. Ordering across lanes:
    negatives by descending |x| (i.e. sgn asc, then sgn*idx asc),
    then zeros, then positives ascending — one window cumsum per
    group, rows bounded by populated buckets.

    ``max_buckets`` enables the collapsing tier
    (:func:`collapse_sketch`, applied to the fold HERE too so reads
    are identical whether the stored deltas were collapsed or not —
    merge invariance) and appends a ``collapsed_frac`` column: the
    floor bucket's share of the group's mass when the group sits AT
    the cap, else 0.0 — the alpha contract holds exactly for every q
    whose rank clears that fraction. One-sided by construction: a
    group NATURALLY holding exactly ``max_buckets`` labels reports its
    true lowest bucket's share as potentially-collapsed (conservative,
    the Count-Min tier's one-sided-contract precedent)."""
    g = _gamma(alpha)
    groups = list(group_cols)
    for q in qs:
        if not 0 <= q <= 1:
            raise ValueError(f"quantile {q} outside [0, 1]")
    if max_buckets is not None:
        folded = collapse_sketch(sketch, groups, max_buckets)
    else:
        folded = sketch.groupBy(*groups, "sgn", "idx").agg(
            F.sum("cnt").alias("cnt")
        )
    # total order over the value line: sort key = sgn, then sgn * idx
    # (negative lane: larger idx = larger |x| = SMALLER value)
    ordk = (F.col("sgn").cast("long") * F.lit(2**40) + F.col("sgn") * F.col(
        "idx"
    )).alias("ordk")
    w = Window.partitionBy(*groups)
    w_ord = w.orderBy("ordk")
    ranked = folded.select(*groups, "sgn", "idx", "cnt", ordk).select(
        "*",
        F.sum("cnt").over(w_ord).alias("cum"),
        F.sum("cnt").over(w).alias("n"),
        F.count(F.lit(1)).over(w).alias("nb"),
        # the group's lowest bucket = the floor when at the cap
        F.first("cnt").over(w_ord).alias("low_cnt"),
    )
    q_frame = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q DOUBLE"
    )
    # est: bucket midpoint 2*gamma^idx/(gamma+1), sign-mirrored; the
    # zero lane returns exactly 0
    mid = F.lit(2.0) * F.pow(F.lit(g), F.col("idx")) / F.lit(g + 1.0)
    est = F.when(F.col("sgn") == 0, F.lit(0.0)).otherwise(
        F.col("sgn") * mid
    )
    joined = ranked.join(F.broadcast(q_frame)).withColumn(
        "rank", F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n")))
    )
    w_pick = Window.partitionBy(*groups, "q").orderBy("ordk")
    out_cols = [*groups, "q", est.alias("est")]
    if max_buckets is not None:
        out_cols.append(
            F.when(
                F.col("nb") >= max_buckets,
                F.col("low_cnt") / F.col("n"),
            )
            .otherwise(F.lit(0.0))
            .alias("collapsed_frac")
        )
    return (
        joined.filter(F.col("cum") >= F.col("rank"))
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(*out_cols)
    )


def dd_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    alpha: float = 0.01,
    max_buckets: int | None = None,
) -> DataFrame:
    """One-pass batch form: sketch then read. Every estimate is within
    ``alpha`` relative error of the exact quantile under the same rank
    convention (pinned in tests on randomized long-tailed data);
    ``max_buckets`` adds the collapsing tier (contract holds above the
    reported ``collapsed_frac``)."""
    return dd_quantiles_from_sketch(
        dd_sketch(df, group_cols, value_col, alpha, max_buckets),
        group_cols,
        qs,
        alpha,
        max_buckets,
    )
