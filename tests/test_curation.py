"""End-to-end curation chain (functions/curation.py): filter -> redact
-> dedup -> resolve -> split -> pack over the fixture corpus plus
injected duplicates/PII/junk rows with known expected fates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions.curation import (
    CurationConfig,
    curate_corpus,
)
from cassandra_iot_pipeline_spark.functions.dedup import canonical
from tests.conftest import SF_DIR

EXACT_DUP_ID = 10_001
NEAR_DUP_ID = 10_002
PII_ID = 10_003
JUNK_ID = 10_004

CFG = CurationConfig(
    min_tokens=5,
    min_alpha_ratio=0.3,
    splits={"train": 0.8, "val": 0.1, "test": 0.1},
    block_size=256,
    pack_shards=8,
)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    # longest doc -> highest near-dup jaccard after a one-word edit
    base = max(docs.collect(), key=lambda r: len(r["text"].split()))
    words = base["text"].split()
    words[len(words) // 2] = "mutated"
    extra = spark.createDataFrame(
        [
            (EXACT_DUP_ID, base["text"], "en", "inject", len(base["text"])),
            (NEAR_DUP_ID, " ".join(words), "en", "inject", 0),
            (
                PII_ID,
                "please contact jane@example.com about the merge of the "
                "fast sort table scan join window hash batch rows",
                "en",
                "inject",
                0,
            ),
            (JUNK_ID, "#### !!!! 1234 ----", "und", "inject", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return docs.unionByName(extra), base["doc_id"]


@pytest.fixture(scope="module")
def result(corpus):
    docs, _ = corpus
    return curate_corpus(docs, CFG)


def test_report_accounting(result):
    rep = result.report()
    assert rep["documents"] == rep["kept_after_filter"] + rep["removed_by_filter"]
    assert rep["after_dedup"] == rep["kept_after_filter"] - rep["removed_as_duplicates"]
    assert rep["removed_as_duplicates"] >= 2  # both injected dups die
    assert rep["docs_with_pii"] >= 1


def test_injected_rows_meet_their_fates(result, corpus):
    _, base_id = corpus
    surviving = {r["doc_id"] for r in result.curated.select("doc_id").collect()}
    assert base_id in surviving            # cluster min survives
    assert EXACT_DUP_ID not in surviving   # exact copy collapsed
    assert NEAR_DUP_ID not in surviving    # one-word edit caught by LSH
    assert JUNK_ID not in surviving        # failed the quality filter
    assert PII_ID in surviving
    pii_row = result.curated.filter(F.col("doc_id") == PII_ID).collect()[0]
    assert "[EMAIL]" in pii_row["text"] and "@example.com" not in pii_row["text"]
    assert pii_row["n_pii"] == 1


def test_curated_has_no_exact_duplicates(result):
    n = result.curated.count()
    n_canon = (
        result.curated.select(canonical(F.col("text")).alias("c"))
        .distinct()
        .count()
    )
    assert n == n_canon


def test_no_dup_pair_survives_whole(result):
    """For every detected duplicate pair, at most one member remains."""
    surv = result.curated.select("doc_id")
    both = (
        result.dup_pairs.join(
            surv.withColumnRenamed("doc_id", "doc_a"), "doc_a"
        )
        .join(surv.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .count()
    )
    assert both == 0


def test_splits_partition_curated(result):
    counts = {
        r["split"]: r["n"]
        for r in result.curated.groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(counts.values()) == result.curated.count()
    assert set(counts) <= {"train", "val", "test"}


def test_packing_covers_exactly_the_train_split(result):
    train_ids = {
        r["doc_id"]
        for r in result.curated.filter(F.col("split") == "train")
        .select("doc_id")
        .collect()
    }
    packed_ids = {r["doc_id"] for r in result.packing.select("doc_id").collect()}
    assert packed_ids == train_ids


def test_filter_respects_config(result):
    kept_profile = result.profile.join(
        result.curated.select("doc_id"), "doc_id"
    )
    bad = kept_profile.filter(
        (F.col("n_tokens") < CFG.min_tokens)
        | (F.col("alpha_ratio") < CFG.min_alpha_ratio)
    ).count()
    assert bad == 0


REP_SPAM_ID = 10_005


def test_repetition_gate(spark, corpus):
    """With a repetition gate on, a boilerplate-repetitive doc is
    dropped while the rest of the corpus outcome is unchanged; with the
    default config (gates off) the same doc survives the filter."""
    docs, _ = corpus
    spam = spark.createDataFrame(
        [
            (
                REP_SPAM_ID,
                "click here to win. click here to win. click here to win. "
                "click here to win. click here to win. click here to win.",
                "en",
                "inject",
                0,
            )
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with_spam = docs.unionByName(spam)

    gated = curate_corpus(
        with_spam,
        CurationConfig(
            min_tokens=5,
            min_alpha_ratio=0.3,
            max_dup_5gram_frac=0.5,
            splits={"train": 0.8, "val": 0.1, "test": 0.1},
            block_size=256,
            pack_shards=8,
        ),
    )
    gated_ids = {r.doc_id for r in gated.kept.select("doc_id").collect()}
    assert REP_SPAM_ID not in gated_ids

    ungated = curate_corpus(with_spam, CFG)
    ungated_ids = {r.doc_id for r in ungated.kept.select("doc_id").collect()}
    assert REP_SPAM_ID in ungated_ids
    # the gate only ever removes: everything else it kept is what the
    # ungated run kept
    assert gated_ids <= ungated_ids


def test_report_surfaces_hot_lsh_buckets(spark):
    """A boilerplate-heavy corpus (one template x 300 docs) trips the
    near-dup tier's hot-bucket routing, and the curation report says so
    instead of burying the recall trade; the corpus still collapses to
    one survivor per template."""
    from cassandra_iot_pipeline_spark.functions.curation import (
        CurationConfig,
        curate_corpus,
    )

    template = (
        "all rights reserved subscribe to the newsletter terms of "
        "service privacy policy copyright footer boilerplate text "
    )
    rows = [
        (i, template + f"tail {i % 2}", "en", "web", len(template))
        for i in range(300)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    out = curate_corpus(docs, CurationConfig(min_alpha_ratio=0.2))
    rep = out.report()
    assert rep["hot_lsh_buckets"] > 0
    assert rep["after_dedup"] == 1  # near-identical template corpus


def test_substring_stage_cuts_boilerplate(spark):
    """r6 verdict item #7: the optional substring-level pass cuts a
    planted boilerplate run out of the dedup SURVIVORS' text, the
    per-doc stats account for exactly the cut bytes, the report
    carries the corpus-wide row, and the cut text flows through split
    assignment + packing (the existing downstream lifecycle)."""
    import random
    import string

    from cassandra_iot_pipeline_spark.functions.substrings import (
        duplicated_spans,
    )

    rng = random.Random(7)

    def words(n, seed):
        r = random.Random(seed)
        return " ".join(
            "".join(r.choice(string.ascii_lowercase) for _ in range(6))
            for _ in range(n)
        )

    boiler = "subscribe to our newsletter all rights reserved terms"
    assert len(boiler) >= 40 + 10
    texts = {}
    for i in range(12):
        body = words(30, seed=50 + i)
        if i < 4:  # planted: boilerplate at varying offsets
            cut_at = rng.randrange(20, 120)
            texts[i] = body[:cut_at] + " " + boiler + " " + body[cut_at:]
        else:
            texts[i] = body
    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in texts.items()],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    cfg = CurationConfig(
        min_alpha_ratio=0.2, substring_dedup=True, substring_k=40
    )
    out = curate_corpus(docs, cfg)
    assert out.substring_stats is not None
    curated = {r["doc_id"]: r["text"] for r in out.curated.collect()}
    stats = {r["doc_id"]: r for r in out.substring_stats.collect()}
    canon = {
        r["doc_id"]: r["c"]
        for r in docs.select(
            "doc_id", canonical(F.col("text")).alias("c")
        ).collect()
    }
    for i in range(12):
        assert i in curated  # distinct bodies: everyone survives dedup
        if i < 4:
            assert boiler not in curated[i]
            assert stats[i]["n_spans"] >= 1
            assert stats[i]["chars_removed"] == len(canon[i]) - len(
                curated[i]
            )
        else:
            assert curated[i] == canon[i]
            assert stats[i]["n_spans"] == 0
            assert stats[i]["chars_removed"] == 0
    rep = out.report()
    assert rep["substring_docs_with_spans"] == 4
    assert rep["substring_chars_removed"] == sum(
        stats[i]["chars_removed"] for i in range(4)
    )
    assert rep["substring_chars_total"] == sum(
        len(canon[i]) for i in range(12)
    )
    # packing packs the CUT text: every packed train doc's chunked
    # length sums to its curated (post-cut) token layout, so no packed
    # row can contain the boilerplate
    packed = out.packing.collect()
    assert packed  # train split is non-empty at 12 docs
    # the stage is opt-in: the default config carries no stats frame
    assert curate_corpus(docs).substring_stats is None
    # and the spans the stage acted on are exactly the library
    # operator's answer over the survivors
    spans = duplicated_spans(docs, k=40).groupBy("doc_id").count()
    assert {r["doc_id"] for r in spans.collect()} == {0, 1, 2, 3}


def test_quality_percentile_gate(spark):
    """quality_keep_frac composes after the absolute gates: the kept
    set is exactly the absolute survivors with quality_score >= the
    survivor distribution's discrete top-frac threshold (boundary
    ties all kept), and tightening the fraction shrinks the corpus
    monotonically."""
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.sampling import (
        score_thresholds,
    )
    from cassandra_iot_pipeline_spark.functions.text import text_profile
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    base_cfg = CurationConfig(min_tokens=3)
    half_cfg = CurationConfig(min_tokens=3, quality_keep_frac=0.5)
    base = curate_corpus(docs, base_cfg)
    half = curate_corpus(docs, half_cfg)
    n_base_kept = base.kept.count()
    n_half_kept = half.kept.count()
    assert 0 < n_half_kept < n_base_kept
    # the cut line matches score_thresholds over the absolute survivors
    profile = text_profile(docs)
    survivors = profile.filter(
        (F.col("n_tokens") >= 3)
        & (F.col("n_tokens") <= base_cfg.max_tokens)
        & (F.col("alpha_ratio") >= base_cfg.min_alpha_ratio)
        & (F.col("quality_score") >= base_cfg.min_quality)
    )
    thr = score_thresholds(
        survivors, "quality_score", 0.5, quantize_decimals=6
    ).collect()[0]
    want_ids = {
        r["doc_id"]
        for r in survivors.filter(
            F.col("quality_score") >= thr["threshold"]
        ).collect()
    }
    got_ids = {r["doc_id"] for r in half.kept.collect()}
    assert got_ids == want_ids
    assert n_half_kept >= thr["k_target"]  # ties only ever inflate


def test_survivor_by_quality(spark, corpus):
    """With survivor_by_quality the exact-dup cluster keeps its
    highest-quality member instead of min doc_id; the schema and every
    other row are unchanged. The injected exact duplicate shares its
    base's text (equal quality -> tie -> min doc_id = the base), so
    plant a dedicated cluster whose higher-id member is strictly
    better quality."""
    docs, base_id = corpus
    good = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank while reading a long and unusually informative article"
    )
    junky = good + " !!!! ####"  # short tail: J ~ 0.9, well inside LSH recall
    planted = spark.createDataFrame(
        [
            (20_001, junky, "en", "inject2", 0),
            (20_002, good, "en", "inject2", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # make them near-dups: same words plus junk tail -> high jaccard
    both = docs.unionByName(planted)
    cfg_min = CurationConfig(
        min_tokens=5, min_alpha_ratio=0.3, minhash_threshold=0.8
    )
    cfg_q = CurationConfig(
        min_tokens=5, min_alpha_ratio=0.3, minhash_threshold=0.8,
        survivor_by_quality=True,
    )
    base = curate_corpus(both, cfg_min)
    byq = curate_corpus(both, cfg_q)
    base_ids = {r["doc_id"] for r in base.curated.collect()}
    byq_ids = {r["doc_id"] for r in byq.curated.collect()}
    # the planted pair clustered in both runs
    assert (20_001 in base_ids) != (20_002 in base_ids)
    assert (20_001 in byq_ids) != (20_002 in byq_ids)
    # min-id policy keeps 20_001; quality policy keeps the clean text
    assert 20_001 in base_ids
    assert 20_002 in byq_ids
    assert set(base.curated.columns) == set(byq.curated.columns)
