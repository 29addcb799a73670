"""Bloom-sketch incremental deduplication: land a new batch against a
~100 TB historical corpus without scanning the corpus per batch.

The classic growing-corpus problem (reference analogue: the pipeline's
at-least-once landing path, spark_consumer.py's idempotent writes): each
incoming batch must drop documents already in the corpus. A plain
anti-join re-shuffles the corpus's distinct keys for every batch — at
100 TB that is the whole cost of the pipeline. The Bloom pattern splits
the decision:

1. **Build once** (`build_bloom_sketch`): one pass over the corpus keys
   produces a fixed-size bit-array sketch stored as an ordinary
   ``(word_idx BIGINT, bits BIGINT)`` DataFrame — persistable as a tiny
   parquet table next to the corpus (10 bits/key ≈ 1.2 GB per 10^9
   keys, vs re-reading the corpus). Maintained incrementally: the
   sketch of (corpus ∪ batch) is just ``bit_or`` of word rows, so each
   landed batch appends its own sketch rows and a trivial re-aggregation
   folds them.
2. **Probe per batch** (`incremental_dedup`): every batch key checks its
   n_hashes bit positions against the sketch — a join that moves only
   8-byte (word_idx, mask) probe rows, with the sketch broadcast when it
   fits (it does up to ~10^8 corpus keys; beyond that the probe join
   shuffles 8-byte keys, never payloads). Keys with any unset bit are
   **definitely new** — they never touch the corpus. Only the
   bloom-positive sliver (true dups + ~1% false positives) goes through
   the exact anti-join, shrinking the corpus-side join input by the
   batch's novelty rate.

The final result is *exact* — the sketch only routes work, it never
decides membership alone — so the whole operator is verified against a
plain anti-join (tests/test_bloom.py), the same way the LSH tiers are
verified against their exhaustive forms.

Hash family: Kirsch-Mitzenmacher double hashing — position_i =
(h1 + i*h2) mod m with h1/h2 two independent xxhash64 draws — gives
n_hashes independent-enough probes from two hash evaluations; all
positions are Catalyst integer expressions (no UDFs anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ~1% false-positive rate at the optimal hash count below
BITS_PER_KEY = 10
#: optimal n_hashes = ln2 * bits_per_key ≈ 7
N_HASHES = 7

#: reserved word index carrying the sketch's own (n_words, n_hashes) —
#: real probe positions are always >= 0, so the metadata row never
#: collides with data.  Probing a persisted sketch with different
#: parameters shifts every bit position: corpus keys would read unset
#: bits, be flagged definitely_new, and incremental_dedup would silently
#: re-admit duplicates.  The guard turns that silent corruption into an
#: in-plan error.
META_WORD_IDX = -1


def _pack_meta(n_words: int, n_hashes: int) -> int:
    if not 1 <= n_hashes < 256:
        raise ValueError(f"n_hashes must be in [1, 255], got {n_hashes}")
    if n_words < 1:
        raise ValueError(f"n_words must be >= 1, got {n_words}")
    return (n_words << 8) | n_hashes


def _meta_guard(sketch: DataFrame, n_words: int, n_hashes: int) -> DataFrame:
    """Single-row frame that raises (lazily, at execution) unless the
    sketch's embedded metadata matches the caller's parameters.  Folding
    two same-parameter sketches bit_or's identical metadata to itself, so
    incremental maintenance preserves the guard; folding sketches of
    *different* parameters corrupts the packed value and trips it."""
    expected = _pack_meta(n_words, n_hashes)
    meta = sketch.filter(F.col("word_idx") == META_WORD_IDX).agg(
        F.count(F.lit(1)).alias("n_meta"),
        F.coalesce(F.min("bits"), F.lit(-1)).alias("meta_bits"),
    )
    ok = (F.col("n_meta") == 1) & (F.col("meta_bits") == expected)
    return meta.select(
        F.when(~ok, F.raise_error(F.format_string(
            "bloom sketch parameter mismatch: probe expects packed "
            f"(n_words<<8|n_hashes) = {expected} (n_words={n_words}, "
            f"n_hashes={n_hashes}) but the sketch carries %d "
            "(meta rows: %d). Probe with the sketch's own parameters, "
            "or rebuild the sketch — re-sizing requires a full rebuild.",
            F.col("meta_bits"), F.col("n_meta"),
        ))).otherwise(F.lit(1)).cast("long").alias("_meta_ok")
    )


def _probe_rows(
    keys: DataFrame, key_col: str, n_words: int, n_hashes: int
) -> DataFrame:
    """One row per (key, probe): the word index and single-bit mask the
    probe must find set. Double hashing; ``pmod`` keeps positions
    non-negative for any hash sign."""
    m = n_words * 64
    # reduce both hashes mod m before combining: i * h2 on the raw
    # 64-bit hash overflows long (ANSI mode throws); after reduction
    # every intermediate stays < n_hashes * m — exact for any practical
    # sketch size, and (a + i*b) mod m is unchanged by reducing a, b
    # first
    h1 = F.pmod(F.xxhash64(F.col(key_col)), F.lit(m))
    h2 = F.pmod(F.xxhash64(F.col(key_col), F.lit(1)), F.lit(m))
    pos = F.pmod(h1 + F.col("i") * h2, F.lit(m))
    return (
        keys.select(key_col, F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("i"))
        .select(
            key_col,
            F.floor(pos / 64).cast("long").alias("word_idx"),
            (pos % 64).cast("int").alias("bit"),
        )
        # dynamic shift amount needs the SQL form (the pyspark wrapper
        # only takes a literal shift)
        .withColumn("mask", F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .drop("bit")
    )


def sketch_words_for_keys(expected_keys: int, bits_per_key: int = BITS_PER_KEY) -> int:
    """Sketch size in 64-bit words for an expected corpus cardinality —
    callers size from a cardinality floor (e.g. the KMV/HLL estimate);
    oversizing only wastes sketch bytes, undersizing only raises the
    false-positive rate (never correctness)."""
    return max(1, (expected_keys * bits_per_key + 63) // 64)


def build_bloom_sketch(
    corpus_keys: DataFrame,
    key_col: str,
    n_words: int,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """One aggregation pass: (word_idx BIGINT, bits BIGINT), only words
    with at least one set bit materialize (the sketch is sparse until
    the corpus fills it). Persist with plain ``.write.parquet`` next to
    the corpus; union + re-aggregate to fold in a new batch's sketch.

    One extra row at ``word_idx = META_WORD_IDX`` embeds (n_words,
    n_hashes); probe-side validates it so a persisted sketch can never be
    silently probed with mismatched parameters."""
    spark = corpus_keys.sparkSession
    meta = spark.createDataFrame(
        [(META_WORD_IDX, _pack_meta(n_words, n_hashes))],
        "word_idx BIGINT, bits BIGINT",
    )
    return (
        _probe_rows(corpus_keys, key_col, n_words, n_hashes)
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
        .unionByName(meta)
    )


def bloom_negative_flag(
    batch: DataFrame,
    sketch: DataFrame,
    key_col: str,
    n_words: int,
    n_hashes: int = N_HASHES,
    broadcast_sketch: bool = True,
) -> DataFrame:
    """The batch's distinct keys flagged ``definitely_new``: true when
    any probe bit is unset (Bloom guarantees no false negatives, so true
    means provably absent from the corpus). One probe-row explode + one
    join against the sketch + one AND-aggregation per key.  A lazy
    single-row guard (crossJoin of one broadcast row) raises at execution
    if the sketch's embedded (n_words, n_hashes) differ from the probe's
    — mismatched parameters would otherwise flag corpus keys
    definitely_new and re-admit duplicates."""
    guard = _meta_guard(sketch, n_words, n_hashes)
    # fold the guard (1 when params match, raise_error otherwise) into
    # the probe mask: mask * 1 == mask, but the multiplication makes the
    # guard column load-bearing so Catalyst cannot column-prune the
    # raise_error away (a bare crossJoin + drop would be optimized out)
    probes = (
        _probe_rows(batch.select(key_col).distinct(), key_col, n_words, n_hashes)
        .crossJoin(F.broadcast(guard))
        .withColumn("mask", F.col("mask") * F.col("_meta_ok"))
        .drop("_meta_ok")
    )
    sk = F.broadcast(sketch) if broadcast_sketch else sketch
    joined = probes.join(sk, "word_idx", "left")
    hit = (F.col("bits").isNotNull()) & (
        F.col("bits").bitwiseAND(F.col("mask")) != 0
    )
    return (
        joined.groupBy(key_col)
        .agg((~F.min(hit.cast("boolean"))).alias("definitely_new"))
    )


def incremental_dedup(
    batch: DataFrame,
    corpus_keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    n_words: int,
    n_hashes: int = N_HASHES,
    broadcast_sketch: bool = True,
) -> DataFrame:
    """Rows of ``batch`` whose key is not in the corpus — bit-for-bit
    the plain anti-join's answer, at a fraction of its cost: keys the
    sketch clears skip the corpus entirely; only bloom-positives (true
    dups + the ~1% false-positive sliver) reach the exact anti-join, so
    the corpus-side join input shrinks by the batch's novelty rate.
    Intra-batch duplicates are preserved (dedupe the batch itself with
    exact_dedup first if needed)."""
    flags = bloom_negative_flag(
        batch, sketch, key_col, n_words, n_hashes, broadcast_sketch
    )
    # left join + coalesce(True): a NULL key never equi-joins its flag
    # row back — but a NULL key also never matches any corpus key in the
    # anti-join this operator must mirror, so NULL-keyed rows are
    # definitely new (an inner join here would silently drop them)
    flagged = batch.join(flags, key_col, "left").withColumn(
        "definitely_new", F.coalesce(F.col("definitely_new"), F.lit(True))
    )
    surely_new = flagged.filter(F.col("definitely_new")).drop("definitely_new")
    maybe_dup = flagged.filter(~F.col("definitely_new")).drop("definitely_new")
    verified_new = maybe_dup.join(
        corpus_keys.select(key_col), key_col, "left_anti"
    )
    return surely_new.unionByName(verified_new)
