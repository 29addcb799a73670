"""Count-Min sketch: fixed-memory token-frequency summary, mergeable
across batches — the heavy-hitter / vocabulary-monitoring primitive for
a continuously-landing corpus (exact per-token counts shuffle the whole
vocabulary every batch; the sketch is depth x width counters whatever
the corpus size, and two sketches fold by plain counter addition).

Portability, the round's running theme: bucket j of a token is read off
hex digits 8j..8j+7 of its sha256 — the same digest DuckDB computes —
and every counter is an exact integer sum, so the entire sketch and
every estimate is bitwise reproducible cross-engine (pinned in
tests/test_sketches.py), unlike hash-seeded sketches whose layout is
engine-private. CM guarantees: estimate >= true count always
(overestimate-only), and P(error > eps*N) <= (1/2)^depth at
width = e/eps.

All Catalyst: one explode per depth row, hash aggregations, a min over
depth estimates — no UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: defaults: eps ~ e/width = 0.27% of total mass, failure prob 2^-4
CM_WIDTH = 1024
CM_DEPTH = 4


def _check_params(width: int, depth: int) -> None:
    """Depth rows read hex digits 8j+1..8j+8 of the 64-char sha256 —
    depth > 8 would silently read past the digest (empty substrings →
    NULL buckets → a corrupted sketch), so enforce the documented limit
    instead of trusting the docstring."""
    if not 1 <= depth <= 8:
        raise ValueError(f"depth must be in [1, 8] (64-hex digest), got {depth}")
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")


def _bucket(hx: Column, j: Column, width: int) -> Column:
    """Bucket for depth-row j: hex digits [8j+1, 8j+8] of the sha256 as
    a 32-bit integer, mod width. Depth <= 8 fits the 64-hex digest."""
    return F.pmod(
        F.conv(hx.substr(F.lit(1) + j * 8, F.lit(8)), 16, 10).cast("long"),
        F.lit(width),
    )


def cm_sketch(
    tokens: DataFrame,
    token_col: str = "t",
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
) -> DataFrame:
    """(j, bucket, c): the populated counters of a depth x width
    Count-Min over the token rows (multiplicity counts). Merge two
    sketches by union + SUM(c) per (j, bucket) — tested associative."""
    _check_params(width, depth)
    hx = F.sha2(F.col(token_col), 256)
    return (
        tokens.select(hx.alias("hx"))
        .select(
            "hx", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
        )
        .select("j", _bucket(F.col("hx"), F.col("j"), width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cm_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    token_col: str = "t",
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    broadcast_sketch: bool = True,
) -> DataFrame:
    """(token, est): the CM upper bound per distinct query token — min
    over the depth counters the token hashes to (absent counter = 0).
    The sketch is depth*width rows at most and broadcasts."""
    _check_params(width, depth)
    probes = (
        queries.select(F.col(token_col).alias("token")).distinct()
        .select("token", F.sha2(F.col("token"), 256).alias("hx"))
        .select(
            "token",
            "hx",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        )
        .select(
            "token", "j", _bucket(F.col("hx"), F.col("j"), width).alias("bucket")
        )
    )
    sk = F.broadcast(sketch) if broadcast_sketch else sketch
    joined = probes.join(sk, ["j", "bucket"], "left").select(
        "token", F.coalesce(F.col("c"), F.lit(0)).alias("cj")
    )
    return joined.groupBy("token").agg(F.min("cj").alias("est"))
