"""Exact substring-level deduplication — the "dedup training data at
the substring granularity" primitive (Lee et al., *Deduplicating
Training Data Makes Language Models Better*): any length-``k``
character run that appears at least ``min_count`` times across the
corpus is marked, per-document overlapping marks merge into maximal
spans, and the spans can be cut out of the text.

Document-level dedup (functions/dedup.py) removes whole near-copies;
this operator removes the boilerplate RUNS that survive it — license
headers, navigation chrome, quoted tweets — which document-level
Jaccard can't see when the surrounding text differs.

Spark-first shape (no suffix array): the paper builds a corpus-wide
suffix array, which is its own distributed system at 100 TB. The
equivalent declarative plan:

1. explode each canonical text into its (doc_id, i, gram) length-k
   windows — ``explode(sequence(...))`` + ``substring``, one scan;
2. find the duplicated grams with ``groupBy(g).count()`` — the
   map-side partial aggregation collapses every occurrence of a gram
   to ONE row per task before the exchange, so a boilerplate gram
   with 10^9 occurrences costs each task one counter, not a
   partition-sized sort (the pre-r7 plan was
   ``count().over(Window.partitionBy(g))``, which lands every
   occurrence of a gram in a single task — a hot-task bound on
   exactly the boilerplate-heavy corpora this operator targets; it
   survives as ``dup_join="window"`` for A/B probes);
3. semi-join the (small — distinct duplicated grams only) dup-gram
   set back onto the positions frame. Under AQE the join
   broadcast-converts at runtime when the set fits, so the full
   positions frame never shuffles at all; when it doesn't fit, AQE's
   skew-join splitting plus Spark's native runtime bloom-filter join
   (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by
   default — it injects a BloomFilterMightContain prefilter on the
   probe side below its shuffle) are the fallback tier;
4. keep those positions, merge overlapping [i, i+k) intervals per doc
   with the classic running-max window (new span iff i > max(previous
   i) + k), sum the new-span flags to number spans, group to
   (span_start, span_end).

Every stage is pure Catalyst and mirrored row-for-row by the DuckDB
oracle (same 1-based substr, same count-then-filter predicate — the
oracle keeps its window form; ``cnt >= min_count`` selects identical
positions either way). Positions are 1-based over the CANONICAL text
(lower, whitespace-collapse, trim — the repo-wide dedup key),
span_end exclusive.

Cost note: the count-then-join plan reads the documents twice (once
to count grams, once to probe). Both passes are narrow scan+explode
map work; the trade removes the k-fold full-corpus wide stage
entirely, which is the binding cost at 100 TB. Caching the exploded
grams instead would pin a k-fold amplification of the corpus —
recompute is the right call at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import canonical

#: default gram length — the paper uses 50 BPE tokens; 40 canonical
#: characters sits in the same "long enough that natural language
#: never repeats it by chance" regime at character granularity
DEFAULT_K = 40

#: dup-gram membership strategies (step 3 of the module plan)
DUP_JOIN_MODES = ("auto", "broadcast", "shuffle", "window")


def _grams(canon: DataFrame, k: int, hash_shuffle: bool) -> DataFrame:
    """(doc_id, i, g): every 1-based length-``k`` window of the
    canonical text. Documents shorter than k emit nothing — without
    the length filter Spark's ``sequence(1, <=0)`` would generate
    DESCENDING indices."""
    grams = canon.filter(F.length("canon") >= F.lit(k)).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("canon") - F.lit(k - 1))
        ).alias("i"),
        F.col("canon"),
    ).select(
        "doc_id", "i", F.col("canon").substr(F.col("i"), F.lit(k)).alias("g")
    )
    if hash_shuffle:
        grams = grams.select("doc_id", "i", F.xxhash64("g").alias("g"))
    return grams


def _dup_positions(
    grams: DataFrame, min_count: int, dup_join: str
) -> DataFrame:
    """Positions whose gram occurs >= min_count times corpus-wide.

    ``auto``/``broadcast``/``shuffle``: partial-aggregable
    ``groupBy(g).count()`` (hot grams collapse map-side) → filter →
    semi-join back onto the positions frame. ``auto`` leaves the join
    strategy to Catalyst/AQE — at runtime the dup-gram set's actual
    post-shuffle size decides broadcast vs shuffle, and AQE splits any
    skewed probe partition; ``broadcast``/``shuffle`` pin the strategy
    for plan tests and probes.

    ``window``: the pre-r7 single-pass plan — one scan, but every
    occurrence of a gram sorts in one task. Kept as a second
    independent implementation for equality tests and as the A/B
    baseline in ``tools/scale_probe.py --substrings``; do not use on
    boilerplate-heavy corpora at scale.
    """
    if dup_join not in DUP_JOIN_MODES:
        raise ValueError(
            f"dup_join must be one of {DUP_JOIN_MODES}, got {dup_join!r}"
        )
    if dup_join == "window":
        cnt = F.count(F.lit(1)).over(Window.partitionBy("g"))
        return (
            grams.withColumn("cnt", cnt)
            .filter(F.col("cnt") >= F.lit(min_count))
            .drop("cnt")
        )
    dup_g = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(min_count))
        .select("g")
    )
    if dup_join == "broadcast":
        dup_g = F.broadcast(dup_g)
    elif dup_join == "shuffle":
        dup_g = dup_g.hint("shuffle_hash")
    return grams.join(dup_g, "g", "semi")


def _merge_spans(dup: DataFrame, k: int) -> DataFrame:
    """(doc_id, span_start, span_end) from marked positions
    (doc_id, i): merge overlapping [i, i+k) intervals per doc with the
    running-max window, number spans with the running sum of new-span
    flags, group to bounds. Shared by the batch operator and the
    streaming pipeline (which selects dup positions against its
    persisted corpus-wide counts)."""
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # a mark starts a NEW span iff it begins after every previous
    # mark's end; ends are all i + k, so the running max of i suffices
    marked = dup.select(
        "doc_id",
        "i",
        F.when(
            F.col("i")
            > F.coalesce(F.max("i").over(prev) + F.lit(k), F.lit(-1)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    run = Window.partitionBy("doc_id").orderBy("i")
    spans = marked.withColumn("span_id", F.sum("is_new").over(run))
    return spans.groupBy("doc_id", "span_id").agg(
        F.min("i").alias("span_start"),
        (F.max("i") + F.lit(k)).alias("span_end"),
    ).select("doc_id", "span_start", "span_end")


def _spans_from_canon(
    canon: DataFrame,
    k: int,
    min_count: int,
    hash_shuffle: bool,
    dup_join: str,
) -> DataFrame:
    dup = _dup_positions(_grams(canon, k, hash_shuffle), min_count, dup_join)
    return _merge_spans(dup, k)


def duplicated_spans(
    documents: DataFrame,
    k: int = DEFAULT_K,
    min_count: int = 2,
    hash_shuffle: bool = False,
    dup_join: str = "auto",
) -> DataFrame:
    """(doc_id, span_start, span_end): maximal merged spans of the
    canonical text covered by length-``k`` grams occurring at least
    ``min_count`` times corpus-wide (all occurrences count, including
    repeats within one document — the paper's semantics). 1-based,
    end-exclusive. Documents shorter than ``k`` emit nothing.

    ``hash_shuffle=True`` is the 100 TB tier: grams are replaced by
    ``xxhash64(gram)`` before any wide stage, so both the count
    exchange and the dup-gram set move 8 bytes per gram instead of
    ~k. The trade is the hashed_tokens contract (functions/dedup.py):
    a cross-gram xxhash64 collision would over-mark w.h.p.
    ~n_grams²/2^64 — negligible below ~10^9 distinct grams, and
    over-marking only ever removes a little extra text, never
    corrupts spans. The default stays exact (the DuckDB oracle
    compares bitwise); tests pin tier equality on the fixtures.

    ``dup_join`` picks the duplicated-gram membership strategy — see
    :func:`_dup_positions`. The default ``"auto"`` is the 100 TB
    posture (partial-agg count + AQE-decided semi-join)."""
    canon = documents.select(
        "doc_id", canonical(F.col("text")).alias("canon")
    )
    return _spans_from_canon(canon, k, min_count, hash_shuffle, dup_join)


def duplicated_spans_oracle(
    k: int = DEFAULT_K, min_count: int = 2, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`duplicated_spans`: identical
    canonicalization (the shingle oracles' form), identical 1-based
    substr windows, identical window frames."""
    return f"""
        WITH canon AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS c
            FROM {table}
        ),
        grams AS (
            SELECT doc_id, CAST(i AS BIGINT) AS i,
                   substr(c, CAST(i AS INT), {k}) AS g
            FROM canon, UNNEST(range(1, len(c) - {k - 1} + 1)) AS t(i)
        ),
        dup AS (
            SELECT doc_id, i
            FROM (
                SELECT doc_id, i,
                       COUNT(*) OVER (PARTITION BY g) AS cnt
                FROM grams
            ) WHERE cnt >= {min_count}
        ),
        marked AS (
            SELECT doc_id, i,
                   CASE WHEN i > COALESCE(
                            MAX(i) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) + {k}, -1)
                        THEN 1 ELSE 0 END AS is_new
            FROM dup
        ),
        numbered AS (
            SELECT doc_id, i,
                   SUM(is_new) OVER (PARTITION BY doc_id ORDER BY i) AS span_id
            FROM marked
        )
        SELECT doc_id,
               MIN(i) AS span_start,
               MAX(i) + {k} AS span_end
        FROM numbered
        GROUP BY doc_id, span_id
    """


def cut_spans(canon: DataFrame, spans: DataFrame) -> DataFrame:
    """(doc_id, text): the ``canon`` column with every span of
    ``spans`` (1-based, end-exclusive, disjoint — the
    :func:`duplicated_spans` contract) cut out; docs with no spans
    pass through unchanged. The cut is a pure-expression fold over
    each doc's sorted span list — no UDF: the accumulator carries
    (kept-so-far, copy-from position) and each span appends the gap
    before it; the finish step appends the tail."""
    per_doc = spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("spans")
    )
    joined = canon.join(per_doc, "doc_id", "left")
    cut = F.aggregate(
        F.coalesce(F.col("spans"), F.array()),
        F.struct(
            F.lit("").alias("kept"), F.lit(1).cast("long").alias("pos")
        ),
        lambda acc, s: F.struct(
            F.concat(
                acc["kept"],
                F.col("canon").substr(
                    acc["pos"], (s["span_start"] - acc["pos"]).cast("int")
                ),
            ).alias("kept"),
            s["span_end"].cast("long").alias("pos"),
        ),
        lambda acc: F.concat(
            acc["kept"],
            F.col("canon").substr(acc["pos"], F.length("canon")),
        ),
    )
    return joined.select("doc_id", cut.alias("text"))


def remove_duplicated_spans(
    documents: DataFrame,
    k: int = DEFAULT_K,
    min_count: int = 2,
    hash_shuffle: bool = False,
    dup_join: str = "auto",
) -> DataFrame:
    """(doc_id, text): the canonical text with every duplicated span
    cut out (documents with no spans pass through canonicalized) —
    :func:`duplicated_spans` composed with :func:`cut_spans` over one
    shared canonical frame. ``hash_shuffle``/``dup_join`` forward to
    the span computation (r6 ADVICE: the removal path previously
    always paid the exact tier)."""
    canon = documents.select(
        "doc_id", canonical(F.col("text")).alias("canon")
    )
    spans = _spans_from_canon(canon, k, min_count, hash_shuffle, dup_join)
    return cut_spans(canon, spans)


def remove_spans_reference(text: str, spans: list[tuple[int, int]]) -> str:
    """Driver-side reference of the span cut (for tests): 1-based,
    end-exclusive spans over the already-canonical text."""
    kept, pos = [], 1
    for start, end in sorted(spans):
        kept.append(text[pos - 1 : start - 1])
        pos = end
    kept.append(text[pos - 1 :])
    return "".join(kept)
