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
    """Portable-family bucket for depth-row j: hex digits [8j+1, 8j+8]
    of the sha256 as a 32-bit integer, mod width. Depth <= 8 fits the
    64-hex digest."""
    return F.pmod(
        F.conv(hx.substr(F.lit(1) + j * 8, F.lit(8)), 16, 10).cast("long"),
        F.lit(width),
    )


def _bucket_xx(token: Column, j: Column, width: int) -> Column:
    """Fast-family bucket: xxhash64(token, j) mod width — one JVM hash
    per (row, depth) instead of a sha256 + hex-substring decode. Not
    cross-engine reproducible (xxhash64 has no DuckDB twin), which is
    the only property it gives up: CM's overestimate-only guarantee
    holds for ANY per-row hash family."""
    return F.pmod(F.xxhash64(token, j), F.lit(width))


def cm_sketch(
    tokens: DataFrame,
    token_col: str = "t",
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    portable: bool = True,
) -> DataFrame:
    """(j, bucket, c): the populated counters of a depth x width
    Count-Min over the token rows (multiplicity counts). Merge two
    sketches by union + SUM(c) per (j, bucket) — tested associative.

    ``portable=True`` (default) uses the sha256-digit layout that
    DuckDB reproduces bitwise (the module's monitoring contract);
    ``portable=False`` switches to xxhash64 buckets — ~2x faster,
    identical guarantees, engine-private layout. A sketch only ever
    composes with estimates/filters built with the SAME flag."""
    _check_params(width, depth)
    js = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    if portable:
        bucketed = (
            tokens.select(F.sha2(F.col(token_col), 256).alias("hx"))
            .select("hx", js)
            .select("j", _bucket(F.col("hx"), F.col("j"), width).alias("bucket"))
        )
    else:
        bucketed = tokens.select(F.col(token_col).alias("t"), js).select(
            "j", _bucket_xx(F.col("t"), F.col("j"), width).alias("bucket")
        )
    return bucketed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cm_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    token_col: str = "t",
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    broadcast_sketch: bool = True,
    portable: bool = True,
) -> DataFrame:
    """(token, est): the CM upper bound per distinct query token — min
    over the depth counters the token hashes to (absent counter = 0).
    The sketch is depth*width rows at most and broadcasts. ``portable``
    must match the flag the sketch was built with."""
    _check_params(width, depth)
    distinct = queries.select(F.col(token_col).alias("token")).distinct()
    js = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    if portable:
        probes = (
            distinct.select("token", F.sha2(F.col("token"), 256).alias("hx"))
            .select("token", "hx", js)
            .select(
                "token",
                "j",
                _bucket(F.col("hx"), F.col("j"), width).alias("bucket"),
            )
        )
    else:
        probes = distinct.select("token", js).select(
            "token",
            "j",
            _bucket_xx(F.col("token"), F.col("j"), width).alias("bucket"),
        )
    sk = F.broadcast(sketch) if broadcast_sketch else sketch
    joined = probes.join(sk, ["j", "bucket"], "left").select(
        "token", F.coalesce(F.col("c"), F.lit(0)).alias("cj")
    )
    return joined.groupBy("token").agg(F.min("cj").alias("est"))


# --- exact heavy hitters via CMS routing -------------------------------------


def _sketch_arrays_row(sketch: DataFrame, width: int, depth: int):
    """Collect the (bounded: depth*width counters, ~32 KB at defaults)
    sketch into ONE broadcastable row of position-indexed counter
    arrays, plus the exact total N (the sum of any one depth row — each
    token occurrence increments exactly one counter per row). The
    collect is control-plane-sized by construction — the sketch's whole
    point is fixed memory — the same bounded class as the IVF centroid
    fetch."""
    rows = sketch.collect()
    arrays = [[0] * width for _ in range(depth)]
    for r in rows:
        arrays[r["j"]][r["bucket"]] = r["c"]
    n_total = sum(arrays[0])
    spark = sketch.sparkSession
    # literal_frame, not createDataFrame: the pickled-RDD form planned
    # a defaultParallelism-task Python scan for this ONE row (r12)
    from ..litframe import literal_frame

    row_df = literal_frame(
        spark,
        [tuple(arrays)],
        ", ".join(f"row{j} ARRAY<BIGINT>" for j in range(depth)),
    )
    return row_df, n_total


def frequent_tokens(
    documents: DataFrame,
    phi: float = 0.001,
    text_col: str = "text",
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    portable: bool = False,
) -> DataFrame:
    """EXACT phi-heavy hitters — every token whose occurrence count is
    >= phi * N (N = total token occurrences) with its exact count —
    without ever aggregating the full token population.

    Two passes, the classic sketch-routed shape:

    1. ``cm_sketch`` summarizes all token rows into depth x width
       counters (map-side combinable, fixed memory);
    2. the token rows stream again against ONE broadcast row holding
       the counters as arrays: each row's CM upper bound is a pure
       projection (``least`` over depth array lookups), and only rows
       whose bound clears phi*N — the candidate sliver — reach the
       exact groupBy; a final exact filter removes the sketch's
       overestimates.

    CMS never underestimates, so no true heavy hitter can be routed
    away: the result is bit-identical to the brute-force groupBy for
    EVERY sketch geometry (pinned in tests) — width/depth tune only how
    small the sliver is, never correctness. For the same reason the
    routing sketch defaults to the fast xxhash64 family
    (``portable=False``, ~2x the sha256 layout): the sketch is an
    internal routing artifact here, never compared cross-engine — the
    operator's OUTPUT is exact counts either way. Precision caveat: the
    ``phi * N`` threshold is computed and compared in double, so the
    bit-identity claim assumes counts below 2^53 (~9e15 — holds at any
    plausible corpus; the brute-force twin evaluates the identical
    double comparison, which is what makes the parity exact rather
    than merely close). At 100 TB the first pass is
    a map-side-combined aggregation to a constant-size sketch and the
    second shuffles only candidate-token rows: the full-population
    shuffle of a naive groupBy never happens.
    """
    from .text import tokens

    _check_params(width, depth)
    if not 0 < phi <= 1:
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    rows = documents.select(
        F.explode(tokens(F.col(text_col))).alias("t")
    )
    sketch = cm_sketch(rows, width=width, depth=depth, portable=portable)
    row_df, n_total = _sketch_arrays_row(sketch, width, depth)
    threshold = phi * n_total
    if portable:
        hx = F.sha2(F.col("t"), 256)
        buckets = [_bucket(hx, F.lit(j), width) for j in range(depth)]
    else:
        buckets = [
            _bucket_xx(F.col("t"), F.lit(j), width) for j in range(depth)
        ]
    lookups = [
        F.element_at(F.col(f"row{j}"), (buckets[j] + 1).cast("int"))
        for j in range(depth)
    ]
    est = lookups[0] if depth == 1 else F.least(*lookups)
    candidates = (
        rows.join(F.broadcast(row_df))
        .filter(est >= F.lit(threshold))
        .select("t")
    )
    return (
        candidates.groupBy(F.col("t").alias("token"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= F.lit(threshold))
    )


def token_frequency_profile(
    documents: DataFrame,
    k: int = 10,
    phi: float = 0.02,
    text_col: str = "text",
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
) -> DataFrame:
    """The two token-frequency surfaces in one result (the driver's
    registered form): (token, n_occurrences, in_topk, is_heavy) for
    every token that is in the exact top-``k`` by occurrence count
    (count desc, token asc tie-break) OR is an exact ``phi``-heavy
    hitter.

    The top-k side is the canonical explode/aggregate/heap plan
    (text.word_frequencies); the heavy side is the CMS-routed exact
    path (:func:`frequent_tokens` — fixed-memory sketch pass, map-side
    candidate filter against one broadcast counter row, exact groupBy
    over the candidate sliver only). Fusing them in one registered
    query keeps BOTH plans driver-checked under the 50-name cap; the
    un-fused word_frequencies keeps its own oracle in
    tests/test_legacy_parity.py. Both sides end in a full outer join on
    the token — their exact counts agree wherever both sides emit, so
    n_occurrences coalesces either way.
    """
    from .text import word_frequencies

    topk = word_frequencies(documents, k).withColumn("in_topk", F.lit(True))
    heavy = frequent_tokens(
        documents, phi, text_col=text_col, width=width, depth=depth
    ).withColumn("is_heavy", F.lit(True))
    return (
        topk.join(
            heavy.select(
                "token",
                F.col("n_occurrences").alias("_n_heavy"),
                "is_heavy",
            ),
            "token",
            "full_outer",
        )
        .select(
            "token",
            F.coalesce("n_occurrences", "_n_heavy").alias("n_occurrences"),
            F.coalesce("in_topk", F.lit(False)).alias("in_topk"),
            F.coalesce("is_heavy", F.lit(False)).alias("is_heavy"),
        )
    )


def token_frequency_profile_oracle(k: int = 10, phi: float = 0.02) -> str:
    """Brute-force DuckDB twin of :func:`token_frequency_profile`: one
    exact count per token, top-k and >= phi*N selections, full outer
    join. The heavy threshold is the same double-precision
    ``count >= phi * N`` comparison the Spark side evaluates (exact
    below 2^53 — see the :func:`frequent_tokens` docstring)."""
    from .text import _oracle_tokens

    toks = _oracle_tokens("text")
    return f"""
        WITH tok AS (
            SELECT unnest({toks}) AS t FROM documents
        ),
        c AS (SELECT t AS token, count(*) AS n FROM tok GROUP BY t),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        topk AS (SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT {k}),
        heavy AS (SELECT token, n FROM c, tot WHERE n >= {phi} * total)
        SELECT COALESCE(tk.token, h.token) AS token,
               COALESCE(tk.n, h.n) AS n_occurrences,
               (tk.token IS NOT NULL) AS in_topk,
               (h.token IS NOT NULL) AS is_heavy
        FROM topk tk FULL OUTER JOIN heavy h ON tk.token = h.token
    """


def frequent_tokens_oracle(phi: float = 0.001) -> str:
    """Brute-force DuckDB twin: exact counts over the full token
    population, same tokenizer, same >= phi*N rule."""
    from .text import _oracle_tokens

    toks = _oracle_tokens("text")
    return f"""
        WITH tok AS (
            SELECT unnest({toks}) AS t FROM documents
        ),
        tot AS (SELECT count(*) AS n FROM tok)
        SELECT t AS token, count(*) AS n_occurrences
        FROM tok
        GROUP BY t
        HAVING count(*) >= {phi} * (SELECT n FROM tot)
    """
