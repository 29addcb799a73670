"""Language-model perplexity scoring — the CCNet-style quality filter:
score each document by how surprising it is under an n-gram model
trained on a reference corpus, then keep/bucket by perplexity.

Spark-first shape, both stages:

- **train** (`bigram_model`): tokenize → explode bigrams → two hash
  aggregations (bigram counts, unigram context counts). Map-side
  combine does the heavy lifting; the model is two skinny count tables
  keyed by 8-byte hashes, reusable across scoring runs (persist as
  parquet like any dimension).
- **score** (`lm_perplexity`): explode each document's bigrams, join
  the model (broadcast when the vocabulary fits — it almost always
  does: even a 10^8-bigram model is a few GB of longs — else a shuffle
  keyed by the 8-byte bigram hash), one aggregation back to doc_id.
  Nothing Python-side; log() is the only transcendental and runs in
  codegen.

Smoothing: add-alpha (Lidstone) over the observed vocabulary —
P(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V) — so unseen bigrams score
finite and the filter is total. Perplexity = exp(-logprob / n_bigrams).

Exactness note: counts and V are exact integers, but log/exp are
engine-specific in the last ulp, so this operator's DuckDB parity test
pins relative error <= 1e-9 (the nano-unit quantization grid) instead
of bitwise equality — the one operator family where bitwise
cross-engine equality is genuinely not achievable without giving up
log-space.

Tokens reuse functions.text.tokens — same vocabulary as the rest of
the text suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

ALPHA = 0.4  # Lidstone smoothing mass; CCNet uses KenLM, same role


def _bigram_rows(documents: DataFrame) -> DataFrame:
    """(doc_id, w1, w2): one row per adjacent token pair. The slice
    runs after the Generate (per-index), not inside a transform lambda —
    the same re-evaluation pathology avoided by shingle_rows."""
    toks = documents.select("doc_id", tokens(F.col("text")).alias("t"))
    # the filter below guarantees size-1 >= 1; do NOT "guard" with
    # greatest(size-1, 0): Spark's sequence(1, 0) is the DESCENDING
    # array [1, 0], and element_at(t, 0) throws under ANSI — the guard
    # would look protective while arming exactly that crash
    idx = F.explode(F.sequence(F.lit(1), F.size("t") - 1))
    return (
        toks.filter(F.size("t") >= 2)
        .select("doc_id", "t", idx.alias("i"))
        .select(
            "doc_id",
            F.element_at("t", F.col("i")).alias("w1"),
            F.element_at("t", F.col("i") + 1).alias("w2"),
        )
    )


def bigram_model(corpus: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """Train: (bigram counts, context counts, vocabulary size). The two
    count tables are the model — persist them like dimensions. V is the
    distinct-unigram count of the corpus (one small action; at scale,
    size it once per model build, not per batch)."""
    bi = _bigram_rows(corpus)
    bigrams = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    contexts = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        corpus.select(F.explode(tokens(F.col("text"))).alias("w"))
        .agg(F.count_distinct("w"))
        .head()[0]
    )
    return bigrams, contexts, int(vocab)


def lm_perplexity(
    documents: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab: int,
    alpha: float = ALPHA,
    broadcast_model: bool = True,
) -> DataFrame:
    """(doc_id, n_bigrams, logprob, ppl) per scoreable document (>= 2
    tokens). Lower ppl = more like the reference corpus; filter or
    bucket downstream (CCNet keeps head/middle by ppl tertile)."""
    bg = F.broadcast(bigrams) if broadcast_model else bigrams
    ctx = F.broadcast(contexts) if broadcast_model else contexts
    # per-bigram log-prob quantized to integer nano-units before the
    # sum: double addition is order-dependent in the last ulp, so a raw
    # SUM(lp) would drift with partition layout — integer sums are
    # associative, keeping the score partition-invariant (the exactmath
    # contract). |lp| < 40, so 1e9 units x 1e6 bigrams/doc << 2^63.
    lp_units = F.round(
        F.log(
            (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha * vocab))
        )
        * F.lit(1e9)
    ).cast("long")
    scored = (
        _bigram_rows(documents)
        .join(bg, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .select("doc_id", lp_units.alias("lp_units"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_units").alias("lp_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("lp_sum").cast("double") / 1e9).alias("logprob"),
            F.exp(
                -(F.col("lp_sum").cast("double") / 1e9) / F.col("n_bigrams")
            ).alias("ppl"),
        )
    )


def perplexity_buckets(
    ppl_df: DataFrame,
    head_frac: float = 1.0 / 3,
    middle_frac: float = 1.0 / 3,
    relative_error: float = 0.001,
) -> DataFrame:
    """CCNet's head/middle/tail split by perplexity — head = most
    reference-like. The cut points come from ``approxQuantile`` (one
    bounded driver action: a Greenwald-Khanna sketch, never the rows)
    and the bucketing itself is a map-only comparison — a global
    percent_rank window would funnel every row through a single
    partition, the exact anti-pattern at corpus scale. Fractions are
    approximate within ``relative_error``; the value ordering between
    buckets is exact by construction (cutoffs are values)."""
    lo, hi = ppl_df.stat.approxQuantile(
        "ppl", [head_frac, head_frac + middle_frac], relative_error
    )
    return ppl_df.withColumn(
        "bucket",
        F.when(F.col("ppl") <= lo, F.lit("head"))
        .when(F.col("ppl") <= hi, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
