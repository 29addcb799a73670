"""BPE tokenizer training/encoding: merge-sequence and segmentation
parity against a from-scratch Python reference (the parity gate for
the repo's iterative, non-SQL-expressible operators), leftmost-greedy
semantics pinned by hand, encode == training segmentation on the
training vocabulary, piece-count conservation, and the early-stop /
edge contracts."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions.bpe import (
    END_MARK,
    bpe_encode,
    bpe_piece_counts,
    bpe_train,
    bpe_word_counts,
)
from tests.conftest import SF_DIR

TOKEN_RE = re.compile(r"[a-z0-9']+")


# -- from-scratch reference (no Spark, no repo imports) -----------------


def ref_word_counts(texts: list[str]) -> dict[str, int]:
    counts: dict[str, int] = {}
    for t in texts:
        for w in TOKEN_RE.findall(t.lower()):
            counts[w] = counts.get(w, 0) + 1
    return counts


def ref_merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Leftmost-greedy non-overlapping single-merge scan."""
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def ref_train(
    word_counts: dict[str, int], n_merges: int, min_count: int = 2
) -> tuple[list[tuple[str, str]], dict[str, list[str]]]:
    vocab = {w: list(w) + [END_MARK] for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        # (count DESC, a ASC, b ASC) — the operator's pinned tie-break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = {w: ref_merge_word(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def ref_encode_training_order(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Apply merges strictly in training order — the semantics the
    rank-scan encoder must reproduce."""
    syms = list(word) + [END_MARK]
    for a, b in merges:
        syms = ref_merge_word(syms, a, b)
    return syms


# -- fixtures ------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    # a bounded slice keeps each of the ~12 training iterations cheap;
    # the word table is what training sees, so the slice loses nothing
    return (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "text")
        .cache()
    )


@pytest.fixture(scope="module")
def texts(corpus):
    return [r["text"] for r in corpus.select("text").collect()]


N_MERGES = 12


@pytest.fixture(scope="module")
def model(corpus):
    return bpe_train(bpe_word_counts(corpus), N_MERGES)


# -- tests ----------------------------------------------------------------


def test_word_counts_match_reference(corpus, texts):
    got = {
        r["w"]: r["c"] for r in bpe_word_counts(corpus).collect()
    }
    assert got == ref_word_counts(texts)


def test_merge_sequence_matches_reference(model, texts):
    ref_merges, _ = ref_train(ref_word_counts(texts), N_MERGES)
    assert model.merges == ref_merges
    assert len(model.merges) == N_MERGES  # corpus is rich enough


def test_vocab_segmentation_matches_reference(model, texts):
    _, ref_vocab = ref_train(ref_word_counts(texts), N_MERGES)
    got = {r["w"]: list(r["syms"]) for r in model.vocab.collect()}
    assert got == ref_vocab


def test_leftmost_greedy_overlap_pinned(spark):
    # "aaa": pair (a,a) fuses the LEFT occurrence -> [aa, a</w>-less...]
    wc = spark.createDataFrame([("aaa", 5)], "w string, c long")
    m = bpe_train(wc, 1, min_count=1)
    assert m.merges == [("a", "a")]
    syms = m.vocab.collect()[0]["syms"]
    assert list(syms) == ["aa", "a", END_MARK]


def test_early_stop_below_min_count(spark):
    # every adjacent pair occurs exactly once -> nothing reaches 2
    wc = spark.createDataFrame([("abc", 1), ("xyz", 1)], "w string, c long")
    m = bpe_train(wc, 10, min_count=2)
    assert m.merges == []


def test_merge_budget_respected(spark):
    wc = spark.createDataFrame([("aaaa", 9)], "w string, c long")
    m = bpe_train(wc, 2, min_count=1)
    assert len(m.merges) == 2


def test_single_char_words(spark):
    # 'a' + END_MARK is a real pair; merging it exhausts the word
    wc = spark.createDataFrame([("a", 3)], "w string, c long")
    m = bpe_train(wc, 5, min_count=2)
    assert m.merges == [("a", END_MARK)]
    assert list(m.vocab.collect()[0]["syms"]) == ["a" + END_MARK]


def test_encode_matches_training_segmentation(model, corpus):
    # every training word's encode == its trained vocab segmentation
    vocab = {r["w"]: list(r["syms"]) for r in model.vocab.collect()}
    enc = bpe_encode(
        corpus.sparkSession.createDataFrame(
            [(i, w) for i, w in enumerate(sorted(vocab))],
            "doc_id long, text string",
        ),
        model.merges,
    )
    got = {r["doc_id"]: list(r["pieces"]) for r in enc.collect()}
    for i, w in enumerate(sorted(vocab)):
        assert got[i] == vocab[w], w


def test_rank_scan_equals_training_order_on_vocab(model):
    from cassandra_iot_pipeline_spark.functions.bpe import _rank_encode

    ranks = {p: i for i, p in enumerate(model.merges)}
    for r in model.vocab.collect():
        w = r["w"]
        assert _rank_encode(w, ranks) == ref_encode_training_order(
            w, model.merges
        ), w


def test_encode_document_order_and_oov(spark, model):
    # pieces follow token order; unseen words fall back to chars+mark
    doc = spark.createDataFrame(
        [(1, "the zq the")], "doc_id long, text string"
    )
    got = list(bpe_encode(doc, model.merges).collect()[0]["pieces"])
    the = ref_encode_training_order("the", model.merges)
    zq = ref_encode_training_order("zq", model.merges)
    assert got == the + zq + the


def test_piece_counts_conserve_corpus(model, corpus, texts):
    # total piece occurrences == sum over words of len(segmentation)*count
    counts = ref_word_counts(texts)
    _, ref_vocab = ref_train(counts, N_MERGES)
    expect: dict[str, int] = {}
    for w, syms in ref_vocab.items():
        for s in syms:
            expect[s] = expect.get(s, 0) + counts[w]
    got = {
        r["piece"]: r["n"]
        for r in bpe_piece_counts(corpus, model.merges).collect()
    }
    assert got == expect


def test_pair_count_plan_partial_aggregates(corpus):
    # the per-iteration aggregation must map-side combine (scale gate)
    from cassandra_iot_pipeline_spark.functions.bpe import (
        _initial_symbols,
        _pair_rows,
    )

    words = bpe_word_counts(corpus).select(
        "w", "c", _initial_symbols().alias("syms")
    )
    plan = (
        _pair_rows(words)
        .groupBy("a", "b")
        .agg(F.sum("c").alias("cnt"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_sum" in plan


def test_vocab_ids_contiguous_and_ordered(spark, corpus, model):
    from cassandra_iot_pipeline_spark.functions.bpe import bpe_vocab

    vocab = bpe_vocab(bpe_word_counts(corpus), model.merges)
    rows = sorted(
        (r["id"], r["token"]) for r in vocab.collect()
    )
    ids = [i for i, _ in rows]
    assert ids == list(range(len(ids)))
    toks = [t for _, t in rows]
    # alphabet block first (sorted), then merge tokens in training order
    n_alpha = len(toks) - len(model.merges)
    assert toks[:n_alpha] == sorted(toks[:n_alpha])
    assert toks[n_alpha:] == [a + b for a, b in model.merges]
    assert END_MARK in toks[:n_alpha]


def test_encode_ids_round_trip_and_oov(spark, corpus, model):
    from cassandra_iot_pipeline_spark.functions.bpe import (
        bpe_encode_ids,
        bpe_vocab,
    )

    vocab = bpe_vocab(bpe_word_counts(corpus), model.merges)
    id2tok = {r["id"]: r["token"] for r in vocab.collect()}
    doc = spark.createDataFrame(
        [(1, "the fast sort"), (2, "zqé")],  # é: outside alphabet
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (list(r["ids"]), r["n_tokens"])
        for r in bpe_encode_ids(doc, model.merges, vocab).collect()
    }
    ids1, n1 = got[1]
    assert n1 == len(ids1) and -1 not in ids1
    # ids decode back to the piece segmentation
    pieces = [id2tok[i] for i in ids1]
    want = (
        ref_encode_training_order("the", model.merges)
        + ref_encode_training_order("fast", model.merges)
        + ref_encode_training_order("sort", model.merges)
    )
    assert pieces == want
    ids2, _ = got[2]
    assert -1 in ids2  # the unseen character maps to unk


def test_tokenizer_report_hand_computed(spark, corpus, model):
    from cassandra_iot_pipeline_spark.functions.bpe import (
        bpe_vocab,
        tokenizer_report,
    )

    vocab = bpe_vocab(bpe_word_counts(corpus), model.merges)
    docs = spark.createDataFrame(
        [
            (1, "the the fast", "a"),
            (2, "tsoré tsoré", "b"),  # é outside the tokenizer class
            (3, "sort", "a"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: (
            r["n_words"], r["n_pieces"], r["fertility"], r["oov_word_rate"]
        )
        for r in tokenizer_report(docs, model.merges, vocab).collect()
    }
    the = len(ref_encode_training_order("the", model.merges))
    fast = len(ref_encode_training_order("fast", model.merges))
    sort = len(ref_encode_training_order("sort", model.merges))
    # é is outside [a-z0-9'], so the token is "tsor" — an unseen word
    # whose chars all exist in the training alphabet (not OOV)
    zq = len(ref_encode_training_order("tsor", model.merges))
    a_pieces = 2 * the + fast + sort
    assert got["a"] == (4, a_pieces, a_pieces / 4, 0.0)
    assert got["b"] == (2, 2 * zq, float(zq), 0.0)


def test_tokenizer_report_oov_rate(spark, corpus, model):
    from cassandra_iot_pipeline_spark.functions.bpe import (
        bpe_vocab,
        tokenizer_report,
    )

    # an in-alphabet-but-unseen word is NOT oov; a digit-bearing word
    # is oov only if digits never appeared in training words
    wc = spark.createDataFrame(
        [("abc", 5), ("bcd", 4), ("cde", 3)], "w string, c long"
    )
    m = bpe_train(wc, 3, min_count=1)
    vocab = bpe_vocab(wc, m.merges)
    docs = spark.createDataFrame(
        [(1, "abc dae", "s"), (2, "a9c", "s")],
        "doc_id long, text string, source string",
    )
    rep = tokenizer_report(docs, m.merges, vocab).collect()[0]
    # 'dae': chars all in {a..e} alphabet -> not oov; 'a9c': 9 unseen
    assert rep["n_words"] == 3
    assert rep["oov_word_rate"] == 1 / 3


def test_train_releases_superseded_checkpoints(spark, corpus):
    from cassandra_iot_pipeline_spark.blocks import cached_rdd_count

    base = cached_rdd_count(spark)
    model = bpe_train(bpe_word_counts(corpus), 8)
    assert len(model.merges) == 8
    # only the FINAL vocab checkpoint may remain beyond the baseline
    # (plus whatever the baseline already held) — not one per merge
    assert cached_rdd_count(spark) <= base + 1


def test_pack_blocks_round_trip(spark, corpus, model):
    from cassandra_iot_pipeline_spark.functions.bpe import (
        bpe_encode_ids,
        bpe_pack_blocks,
        bpe_vocab,
    )

    vocab = bpe_vocab(bpe_word_counts(corpus), model.merges)
    bs, shards = 64, 4
    blocks = bpe_pack_blocks(
        corpus, model.merges, vocab, block_size=bs, n_shards=shards,
    ).collect()
    assert all(len(r["ids"]) == bs for r in blocks)
    # rebuild each shard's stream and compare to the documents' ids
    enc = {
        r["doc_id"]: list(r["ids"])
        for r in bpe_encode_ids(corpus, model.merges, vocab).collect()
    }
    shard_of = {
        r["doc_id"]: r["s"]
        for r in corpus.selectExpr(
            "doc_id", f"pmod(xxhash64(doc_id), {shards}) as s"
        ).collect()
    }
    got_streams = {}
    for r in sorted(blocks, key=lambda r: (r["shard"], r["block"])):
        got_streams.setdefault(r["shard"], []).extend(r["ids"])
    for sh, stream in got_streams.items():
        # strip padding (-3) from the tail only
        while stream and stream[-1] == -3:
            stream.pop()
        want = []
        for d in sorted(k for k, v in shard_of.items() if v == sh):
            want.extend(enc[d])
            want.append(-2)  # separator
        assert stream == want, sh
    # every shard's block ids are contiguous from 0
    for sh in got_streams:
        bids = sorted(r["block"] for r in blocks if r["shard"] == sh)
        assert bids == list(range(len(bids)))


def ref_train_multi(
    word_counts: dict[str, int],
    n_merges: int,
    per_iter: int,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """From-scratch reference of the merges_per_iter tier: per round,
    rank the round's pair counts by (count DESC, a, b) and greedily
    commit up to ``per_iter`` pairs whose symbols and produced token
    are disjoint from every pair already committed this round."""
    vocab = {w: list(w) + [END_MARK] for w in word_counts}
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + word_counts[w]
        ranked = sorted(
            (
                (c, a, b)
                for (a, b), c in pair_counts.items()
                if c >= min_count
            ),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        if not ranked:
            break
        room = min(per_iter, n_merges - len(merges))
        used: set[str] = set()
        batch: list[tuple[str, str]] = []
        for c, a, b in ranked[: room * 4]:
            if len(batch) >= room:
                break
            if {a, b, a + b} & used:
                continue
            batch.append((a, b))
            used |= {a, b, a + b}
        merges.extend(batch)
        for a, b in batch:
            vocab = {w: ref_merge_word(s, a, b) for w, s in vocab.items()}
    return merges


def test_multi_merge_n1_is_bit_identical_to_exact(corpus, model):
    """merges_per_iter=1 IS the exact path (r8 verdict #2): identical
    merge list and identical final segmentation."""
    m1 = bpe_train(bpe_word_counts(corpus), N_MERGES, merges_per_iter=1)
    assert m1.merges == model.merges
    assert sorted(
        (r["w"], tuple(r["syms"])) for r in m1.vocab.collect()
    ) == sorted((r["w"], tuple(r["syms"])) for r in model.vocab.collect())


def test_multi_merge_round_commits_disjoint_pairs(corpus, texts):
    """N=16: every committed round is pairwise symbol-disjoint (the
    correctness condition that keeps each committed pair's stale count
    exact), the budget is respected, and the model still round-trips:
    rank-scan encoding ≡ training-order application on every training
    word, and ids decode back to the segmentation."""
    from cassandra_iot_pipeline_spark.functions.bpe import (
        bpe_encode_ids,
        bpe_vocab,
    )

    wc = bpe_word_counts(corpus)
    m16 = bpe_train(wc, N_MERGES, merges_per_iter=16)
    assert len(m16.merges) == N_MERGES
    # the whole run equals a from-scratch simulation of the algorithm
    # (rounds of greedy DISJOINT selection over that round's counts) —
    # round boundaries aren't N-aligned (conflicting pairs wait), so
    # equality against the simulation is the structural check
    assert m16.merges == ref_train_multi(ref_word_counts(texts), N_MERGES, 16)
    # the model is a valid BPE model: training segmentation ==
    # training-order re-application, and the encoder reproduces it
    got = {r["w"]: list(r["syms"]) for r in m16.vocab.collect()}
    for w, syms in got.items():
        assert syms == ref_encode_training_order(w, m16.merges), w
    vocab = bpe_vocab(wc, m16.merges)
    id2tok = {r["id"]: r["token"] for r in vocab.collect()}
    doc = corpus.sparkSession.createDataFrame(
        [(1, texts[0])], "doc_id long, text string"
    )
    row = bpe_encode_ids(doc, m16.merges, vocab).collect()[0]
    assert -1 not in row["ids"]
    pieces = [id2tok[i] for i in row["ids"]]
    want = [
        p
        for w in TOKEN_RE.findall(texts[0].lower())
        for p in ref_encode_training_order(w, m16.merges)
    ]
    assert pieces == want


def test_multi_merge_first_round_matches_stale_top(corpus, texts):
    """The N>1 approximation is exactly 'top disjoint pairs by the
    round's counts': the first round of a merges_per_iter=4 run equals
    the greedy disjoint selection over the INITIAL pair counts computed
    from scratch."""
    wc_dict = ref_word_counts(texts)
    vocab = {w: list(w) + [END_MARK] for w in wc_dict}
    pair_counts: dict[tuple[str, str], int] = {}
    for w, syms in vocab.items():
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + wc_dict[w]
    ranked = sorted(
        ((c, a, b) for (a, b), c in pair_counts.items() if c >= 2),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    used: set[str] = set()
    want: list[tuple[str, str]] = []
    for c, a, b in ranked:
        if len(want) >= 4:
            break
        if {a, b, a + b} & used:
            continue
        want.append((a, b))
        used |= {a, b, a + b}
    m = bpe_train(bpe_word_counts(corpus), 4, merges_per_iter=4)
    assert m.merges == want
