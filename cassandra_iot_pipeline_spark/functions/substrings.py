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
2. count occurrences per gram with a window over the gram itself —
   the window's exchange is the only wide operation, and its key IS
   the gram (exact, not a hash: the oracle must match bitwise; at
   100 TB you shuffle xxhash64(gram) first and verify in-bucket, the
   hashed_tokens posture, at the cost of a w.h.p. contract);
3. keep positions whose gram count >= min_count, merge overlapping
   [i, i+k) intervals per doc with the classic running-max window
   (new span iff i > max(previous i) + k), sum the new-span flags to
   number spans, group to (span_start, span_end).

Every stage is pure Catalyst and mirrored row-for-row by the DuckDB
oracle (same 1-based substr, same window frames). Positions are
1-based over the CANONICAL text (lower, whitespace-collapse, trim —
the repo-wide dedup key), span_end exclusive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import canonical

#: default gram length — the paper uses 50 BPE tokens; 40 canonical
#: characters sits in the same "long enough that natural language
#: never repeats it by chance" regime at character granularity
DEFAULT_K = 40


def duplicated_spans(
    documents: DataFrame,
    k: int = DEFAULT_K,
    min_count: int = 2,
    hash_shuffle: bool = False,
) -> DataFrame:
    """(doc_id, span_start, span_end): maximal merged spans of the
    canonical text covered by length-``k`` grams occurring at least
    ``min_count`` times corpus-wide (all occurrences count, including
    repeats within one document — the paper's semantics). 1-based,
    end-exclusive. Documents shorter than ``k`` emit nothing.

    ``hash_shuffle=True`` is the 100 TB tier: the count window
    partitions on ``xxhash64(gram)`` and the gram string is dropped
    before the exchange, so the wide stage moves 16 bytes/row instead
    of ~k — the exact tier's shuffle is a k-fold amplification of the
    corpus, which is the binding cost at scale. The trade is the
    hashed_tokens contract (functions/dedup.py): a cross-gram xxhash64
    collision would over-mark w.h.p. ~n_grams²/2^64 — negligible below
    ~10^9 distinct grams, and over-marking only ever removes a little
    extra text, never corrupts spans. The default stays exact (the
    DuckDB oracle compares bitwise); tests pin tier equality on the
    fixtures."""
    canon = documents.select(
        "doc_id", canonical(F.col("text")).alias("canon")
    )
    # documents shorter than k carry no length-k window; without this
    # filter Spark's sequence(1, <=0) would generate DESCENDING indices
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
    cnt = F.count(F.lit(1)).over(Window.partitionBy("g"))
    dup = grams.withColumn("cnt", cnt).filter(
        F.col("cnt") >= F.lit(min_count)
    )
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


def remove_duplicated_spans(
    documents: DataFrame, k: int = DEFAULT_K, min_count: int = 2
) -> DataFrame:
    """(doc_id, text): the canonical text with every duplicated span
    cut out (documents with no spans pass through canonicalized). The
    cut is a pure-expression fold over each doc's sorted span list —
    no UDF: the accumulator carries (kept-so-far, copy-from position)
    and each span appends the gap before it; the finish step appends
    the tail. Spans from :func:`duplicated_spans` never overlap and
    arrive disjoint by construction, so the fold is total."""
    canon = documents.select(
        "doc_id", canonical(F.col("text")).alias("canon")
    )
    spans = duplicated_spans(documents, k, min_count)
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


def remove_spans_reference(text: str, spans: list[tuple[int, int]]) -> str:
    """Driver-side reference of the span cut (for tests): 1-based,
    end-exclusive spans over the already-canonical text."""
    kept, pos = [], 1
    for start, end in sorted(spans):
        kept.append(text[pos - 1 : start - 1])
        pos = end
    kept.append(text[pos - 1 :])
    return "".join(kept)
