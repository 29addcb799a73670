"""Byte-pair-encoding tokenizer training and encoding — the
vocabulary-learning stage of a training-data pipeline (Sennrich et al.
2016), expressed Spark-first.

Why this shape survives 100 TB: BPE never iterates over the corpus.
One corpus scan builds the word-frequency table (``bpe_word_counts`` —
tokenize, explode, one hash aggregation with map-side combine); every
training iteration then runs over that VOCAB-sized frame (distinct
words, not token occurrences — millions of rows where the corpus has
trillions).  Per merge: one pair-explode + hash aggregation over the
word table, one ``limit(1)`` collect of the single winning pair (the
repo's documented bounded-collect class: one row per iteration, never
data), and one map-only fold that applies the merge inside codegen.
The iterated frame is ``localCheckpoint``-ed each step so the plan
stays flat instead of nesting one lambda per merge.

Encoding re-uses the same asymmetry: ``bpe_encode`` segments each
DISTINCT word once (an Arrow-batched pandas UDF applying the learned
ranks — the classic imperative merge loop, confined to the vocab-sized
frame like the repo's other codec-class UDFs) and joins the
segmentation back onto token occurrences; the corpus-wide stage is
pure join + explode + aggregation.

Determinism contract: the winning pair each round is
(count DESC, a ASC, b ASC) — bit-reproducible across partitionings
because counts are exact integers.  Merging is leftmost-greedy within
a word (the reference implementation's left-to-right scan), pinned
against a from-scratch Python reference in tests/test_bpe.py.  Merges
never cross word boundaries: every word ends with the ``END_MARK``
sentinel symbol, which cannot collide with tokenizer output (tokens
are ``[a-z0-9']+`` runs, functions/text.py).

Not SQL-expressible (iterative argmax), so no DuckDB oracle — the
parity gate is the from-scratch reference, the established pattern for
the repo's iterative operators.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import NamedTuple

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

END_MARK = "</w>"  # outside the tokenizer alphabet [a-z0-9'] by construction
MIN_COUNT = 2  # stop when the best pair occurs fewer times (Sennrich default)


class BpeModel(NamedTuple):
    """A learned merge list plus the training vocabulary's final
    segmentation (``w``, ``c``, ``syms``) — persist ``merges`` like any
    other small dimension; ``vocab`` is reproducible from it."""

    merges: list[tuple[str, str]]
    vocab: DataFrame


def bpe_word_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, c): the word-frequency table — the ONLY corpus-wide stage of
    training. One scan, one exchange; map-side combine collapses each
    task's repeats before the shuffle."""
    return (
        documents.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _initial_symbols() -> Column:
    """Character symbols plus the word-end sentinel. Built with an
    index transform (substring per position) rather than split(w, '')
    — the empty-pattern split's trailing-empty behavior is
    engine-version trivia this avoids entirely."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substr("w", i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_MARK)))


def _pair_rows(words: DataFrame) -> DataFrame:
    """One row per adjacent symbol pair per word, weighted by the
    word's corpus count. The struct array materializes BEFORE the
    explode (the repo's shingle/postings lesson: a lambda re-evaluated
    under Generate re-tokenizes per output row)."""
    pairs = F.transform(
        F.slice("syms", 1, F.size("syms") - 1),
        lambda s, i: F.struct(
            s.alias("a"), F.element_at("syms", i + F.lit(2)).alias("b")
        ),
    )
    return (
        words.filter(F.size("syms") >= 2)
        .select("c", F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "c")
    )


def _apply_merge(a: str, b: str) -> Column:
    """Leftmost-greedy single-merge fold over ``syms``: scan left to
    right, fusing (a, b) into ab wherever the accumulator's last symbol
    is ``a`` and the incoming one is ``b``. A symbol just produced by a
    fusion is the CONCATENATED string, so it can never re-match ``a``
    unless ``b`` were empty (impossible) — exactly the reference
    implementation's non-overlapping left scan."""
    ab = a + b
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    word_counts: DataFrame,
    n_merges: int,
    min_count: int = MIN_COUNT,
    merges_per_iter: int = 1,
) -> BpeModel:
    """Learn up to ``n_merges`` merges from a (w, c) word table.

    Per iteration: pair-count aggregation over the vocab-sized frame,
    ONE bounded collect (the round's winners), one map-only fold per
    winner. Stops early when no adjacent pair reaches ``min_count``.
    The words frame is localCheckpoint-ed each round — without it the
    fold lambdas nest one level per merge and analysis cost grows
    quadratically.

    ``merges_per_iter``: how many merges to commit per pair-count
    round. 1 (default) is EXACT reference BPE — recount after every
    merge. N>1 is the standard scalable approximation for
    production-sized vocabularies (the loop is inherently
    driver-sequential at ~1 s/round, so a 30k-merge vocab at N=1 is
    ~10 h of iterations): take the round's top pairs in (count DESC,
    a, b) order, but commit only pairs whose symbols AND produced
    token are disjoint from every pair already committed this round —
    disjointness makes the stale counts exactly correct for each
    committed pair (merging (a,b) can only perturb counts of pairs
    touching a, b, or ab), so every committed pair's count is its true
    count; conflicting pairs simply wait for the next round.
    Trade-off vs reference BPE: merge ORDER can diverge — a pair that
    only becomes top-ranked BECAUSE of an earlier same-round merge
    (e.g. (x, ab) after (a,b)) is picked a round later than the exact
    path would pick it, so the learned merge LIST may differ from
    N=1's beyond the first round. The result is still a valid BPE
    model (rank-scan encoding, id round-trip, packing all hold — the
    properties pinned in tests); N=1 is bit-identical to the exact
    path by construction."""
    from ..blocks import release_local_checkpoint

    if merges_per_iter < 1:
        raise ValueError(f"merges_per_iter must be >= 1, got {merges_per_iter}")
    words = word_counts.select(
        "w", F.col("c").cast("long").alias("c"), _initial_symbols().alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        room = min(merges_per_iter, n_merges - len(merges))
        # Collect a bounded candidate window: conflicts skip candidates,
        # so over-fetch 4x (the first candidate is always committable —
        # progress is guaranteed; heavy conflicts just shrink the round).
        top = (
            _pair_rows(words)
            .groupBy("a", "b")
            .agg(F.sum("c").alias("cnt"))
            .filter(F.col("cnt") >= min_count)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(room * 4)
            .collect()
        )
        if not top:
            break
        used: set[str] = set()
        batch: list[tuple[str, str]] = []
        for r in top:
            if len(batch) >= room:
                break
            toks = {r["a"], r["b"], r["a"] + r["b"]}
            if toks & used:
                continue
            batch.append((r["a"], r["b"]))
            used |= toks
        merges.extend(batch)
        prev = words
        for a, b in batch:
            # symbol-disjoint merges commute; fold them in committed
            # order inside one checkpointed projection
            words = words.withColumn("syms", _apply_merge(a, b))
        words = words.localCheckpoint(eager=True)
        # the superseded checkpoint is spent the moment its successor
        # materializes — release it (blocks.py): a 30k-merge training
        # run must hold TWO vocab copies in block storage, not 30k
        release_local_checkpoint(prev)
    return BpeModel(merges=merges, vocab=words)


def _rank_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference merge loop used by the encoding UDF: repeatedly fuse
    the lowest-rank adjacent pair, leftmost-greedy within a rank —
    reproduces training segmentation for any word (rank order IS
    training order)."""
    syms = list(word) + [END_MARK]
    while len(syms) >= 2:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pieces): each document's BPE segmentation, word pieces
    concatenated in token order.

    Scale shape: segment each DISTINCT word once (pandas UDF over the
    vocab-sized frame — the merge loop is imperative by nature, and
    this is the repo's codec-class confinement: Python touches words,
    never token occurrences), then join the segmentation back onto the
    (doc, position, word) rows and fold pieces per document in position
    order. The join keys on the word string; AQE broadcasts the
    segmented vocab when it fits and shuffles both sides by ``w``
    otherwise — either way the corpus side is touched exactly once."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _rank_encode(w, ranks))

    toks = documents.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("pos", "w")
    )
    vocab = toks.select("w").distinct().withColumn("pieces", seg("w"))
    return (
        toks.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "pieces"))
                    ),
                    lambda s: s["pieces"],
                )
            ).alias("pieces")
        )
    )


def bpe_piece_counts(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """(piece, n): corpus-wide learned-vocabulary token counts — the
    "token counting" serving read under the trained tokenizer. Same
    distinct-word confinement as bpe_encode; the corpus-wide stages are
    one explode-join and one hash aggregation (map-side combined)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _rank_encode(w, ranks))

    toks = documents.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    )
    word_n = toks.groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
    segmented = word_n.withColumn("pieces", seg("w"))
    return (
        segmented.select(F.explode("pieces").alias("piece"), "wc")
        .groupBy("piece")
        .agg(F.sum("wc").alias("n"))
    )


def bpe_vocab(
    word_counts: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(token, id): the learned vocabulary with contiguous ids — the
    standard BPE construction: the base alphabet (every character seen
    in training plus END_MARK) sorted lexicographically, then one
    token per merge in training order. The alphabet collect is the
    bounded-collect class (charset-sized — a few hundred rows, never
    data); ids are therefore deterministic for a given corpus + merge
    list."""
    spark = word_counts.sparkSession
    chars = (
        word_counts.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.substr("w", i, F.lit(1)),
                )
            ).alias("ch")
        )
        .distinct()
        .collect()
    )
    alphabet = sorted({r["ch"] for r in chars} | {END_MARK})
    tokens_in_order = list(alphabet)
    seen = set(alphabet)
    for a, b in merges:
        t = a + b
        if t not in seen:  # a merge can re-derive an existing string
            tokens_in_order.append(t)
            seen.add(t)
    return spark.createDataFrame(
        [(t, i) for i, t in enumerate(tokens_in_order)],
        "token STRING, id BIGINT",
    )


def bpe_encode_ids(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    text_col: str = "text",
    unk_id: int = -1,
) -> DataFrame:
    """(doc_id, ids, n_tokens): each document's id sequence under the
    learned vocabulary — the shape a training-data loader consumes.
    Pieces built from characters outside the training alphabet map to
    ``unk_id`` (a LEFT join against the broadcast vocab — the vocab is
    |alphabet| + n_merges rows, always broadcastable). Same
    distinct-word confinement as :func:`bpe_encode`; the id join runs
    on the vocab-sized segmentation frame, not on token occurrences."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _rank_encode(w, ranks))

    toks = documents.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("pos", "w")
    )
    word_pieces = (
        toks.select("w")
        .distinct()
        .withColumn("pieces", seg("w"))
        .select("w", F.posexplode("pieces").alias("ppos", "piece"))
        .join(F.broadcast(vocab), F.col("piece") == F.col("token"), "left")
        .groupBy("w")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ppos",
                            F.coalesce("id", F.lit(unk_id)).alias("id"),
                        )
                    )
                ),
                lambda s: s["id"],
            ).alias("wids")
        )
    )
    return (
        toks.join(word_pieces, "w")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "wids"))),
                    lambda s: s["wids"],
                )
            ).alias("ids")
        )
        .select("doc_id", "ids", F.size("ids").alias("n_tokens"))
    )


def tokenizer_report(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    group_cols: Sequence[str] = ("source",),
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer health: (group..., n_words, n_pieces,
    fertility, oov_word_rate) — the drift read a corpus owner runs
    when new data arrives under a FROZEN tokenizer. Fertility
    (pieces per word) rising means the vocabulary fits the new corpus
    worse; oov_word_rate > 0 means characters outside the training
    alphabet (their pieces map to unk under ``bpe_encode_ids``).

    Same distinct-word confinement as the encoders: segmentation and
    the per-word OOV probe run once per DISTINCT word (the pandas UDF
    and the broadcast-vocab join touch the vocab-sized frame), then
    per-group word counts join the per-word stats — corpus-wide work
    is one tokenize-explode aggregation and one join keyed on the
    word. Fertility and rate are exact-integer ratios with one IEEE
    division each (the exactmath rule)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _rank_encode(w, ranks))

    groups = list(group_cols)
    word_n = (
        documents.select(
            *groups, F.explode(tokens(F.col(text_col))).alias("w")
        )
        .groupBy(*groups, "w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab_set = F.broadcast(vocab.select(F.col("token").alias("piece")))
    word_stats = (
        word_n.select("w")
        .distinct()
        .withColumn("pieces", seg("w"))
        .select("w", F.explode("pieces").alias("piece"))
        .join(vocab_set.withColumn("_known", F.lit(1)), "piece", "left")
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("n_p"),
            F.max(F.col("_known").isNull().cast("int")).alias("has_unk"),
        )
    )
    return (
        word_n.join(word_stats, "w")
        .groupBy(*groups)
        .agg(
            F.sum("wc").alias("n_words"),
            F.sum(F.col("wc") * F.col("n_p")).alias("n_pieces"),
            (
                F.sum(F.col("wc") * F.col("n_p")).cast("double")
                / F.sum("wc")
            ).alias("fertility"),
            (
                F.sum(F.col("wc") * F.col("has_unk")).cast("double")
                / F.sum("wc")
            ).alias("oov_word_rate"),
        )
    )


def bpe_pack_blocks(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    block_size: int = 2048,
    n_shards: int = 64,
    sep_id: int = -2,
    pad_id: int = -3,
    text_col: str = "text",
) -> DataFrame:
    """The pipeline's end product: fixed-size id blocks a training
    loader maps straight to tensors — (shard, block, ids) with
    ``len(ids) == block_size`` exactly (each shard's final block
    right-pads with ``pad_id``). Documents lay end-to-end in doc_id
    order within hash shards, one ``sep_id`` after each document, and
    may straddle block boundaries — the cleaning.pack_concat layout,
    materialized over the LEARNED vocabulary's id sequences instead of
    raw token counts.

    Plan shape: id sequences come from :func:`bpe_encode_ids`
    (distinct-word confinement); the per-shard running offset is the
    pack_concat window (partitioned by shard — never a global sort);
    the materialization explodes ids once (token-proportional, the
    corpus itself) into ONE exchange keyed (shard, block), where each
    block's ids assemble with a block_size-bounded sort. Blocks never
    cross shards, so shards are independently consumable files.

    Round-trip contract (pinned in tests): concatenating a shard's
    blocks and stripping padding reproduces exactly the shard's
    documents' ids joined by separators, in doc_id order."""
    enc = bpe_encode_ids(documents, merges, vocab, text_col)
    sized = enc.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).alias("shard"),
        F.concat("ids", F.array(F.lit(sep_id).cast("long"))).alias("_ids"),
        (F.col("n_tokens") + 1).cast("long").alias("_len"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    laid = sized.withColumn(
        "start_tok", F.coalesce(F.sum("_len").over(w), F.lit(0).cast("long"))
    )
    positioned = laid.select(
        "shard",
        F.posexplode("_ids").alias("_p", "id"),
        (F.col("start_tok")).alias("_s"),
    ).select(
        "shard",
        (F.col("_s") + F.col("_p")).alias("tok_pos"),
        "id",
    )
    blocks = (
        positioned.select(
            "shard",
            F.expr(f"tok_pos div {block_size}").alias("block"),
            F.pmod(F.col("tok_pos"), F.lit(block_size)).alias("_bp"),
            "id",
        )
        .groupBy("shard", "block")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_bp", "id"))),
                lambda s: s["id"],
            ).alias("_ids"),
        )
    )
    pad_tail = F.concat(
        F.col("_ids"),
        F.array_repeat(
            F.lit(pad_id).cast("long"),
            F.lit(block_size) - F.size("_ids"),
        ),
    )
    return blocks.select(
        "shard", "block", pad_tail.alias("ids")
    )
