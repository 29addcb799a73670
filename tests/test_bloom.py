"""Bloom-sketch incremental dedup: exactness vs the plain anti-join,
the no-false-negative guarantee, false-positive-rate sanity, sketch
persistence, and the plan shape (broadcast probe join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions.bloom import (
    bloom_negative_flag,
    build_bloom_sketch,
    incremental_dedup,
    sketch_words_for_keys,
)
from tests.conftest import SF_DIR


def _split(documents):
    """Corpus = docs 0..349; batch = docs 300..499 re-keyed by canonical
    text — a realistic landing batch: ~50 true dups + ~150 new docs."""
    canon = F.sha2(F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")), 256)
    keyed = documents.select(F.col("doc_id"), canon.alias("canon"))
    corpus = keyed.filter(F.col("doc_id") < 350).select("canon").distinct()
    batch = keyed.filter(F.col("doc_id") >= 300)
    return corpus, batch


def test_incremental_dedup_equals_plain_anti_join(spark):
    documents = load_table(spark, SF_DIR, "documents")
    corpus, batch = _split(documents)
    n_words = sketch_words_for_keys(400)
    sketch = build_bloom_sketch(corpus, "canon", n_words)
    got = incremental_dedup(batch, corpus, sketch, "canon", n_words)
    want = batch.join(corpus, "canon", "left_anti")
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )


def test_no_false_negatives(spark):
    """Every corpus key must be bloom-positive — the guarantee the
    routing correctness rests on (a false negative would skip the exact
    verify and silently re-admit a duplicate)."""
    documents = load_table(spark, SF_DIR, "documents")
    corpus, _ = _split(documents)
    n_words = sketch_words_for_keys(400)
    sketch = build_bloom_sketch(corpus, "canon", n_words)
    flags = bloom_negative_flag(corpus, sketch, "canon", n_words)
    assert flags.filter(F.col("definitely_new")).count() == 0


def test_false_positive_rate_sane(spark):
    """On a disjoint batch, the positive rate is the sketch's fpp —
    ~1% at 10 bits/key, pinned loosely at <10%."""
    corpus = spark.range(0, 2000).select(
        F.concat(F.lit("corpus_"), F.col("id")).alias("k")
    )
    batch = spark.range(0, 1000).select(
        F.concat(F.lit("fresh_"), F.col("id")).alias("k")
    )
    n_words = sketch_words_for_keys(2000)
    sketch = build_bloom_sketch(corpus, "k", n_words)
    flags = bloom_negative_flag(batch, sketch, "k", n_words)
    positives = flags.filter(~F.col("definitely_new")).count()
    assert positives < 100, f"fpp {positives / 1000:.1%} too high"


def test_sketch_persists_and_folds(spark, tmp_path):
    """The sketch is an ordinary parquet table, and the sketch of
    (corpus ∪ batch) equals bit_or-folding the two sketches — the
    incremental-maintenance property."""
    a = spark.range(0, 500).select(F.concat(F.lit("a"), F.col("id")).alias("k"))
    b = spark.range(0, 500).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    n_words = sketch_words_for_keys(1000)
    path = str(tmp_path / "sketch")
    build_bloom_sketch(a, "k", n_words).write.parquet(path)
    folded = (
        spark.read.parquet(path)
        .unionByName(build_bloom_sketch(b, "k", n_words))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    whole = build_bloom_sketch(a.unionByName(b), "k", n_words)
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_mismatched_sketch_params_raise(spark):
    """Probing a persisted sketch with different (n_words, n_hashes)
    shifts every bit position — the guard must turn that silent
    re-admission of duplicates into a loud failure."""
    import pytest

    corpus = spark.range(0, 500).select(
        F.concat(F.lit("c"), F.col("id")).alias("k")
    )
    n_words = sketch_words_for_keys(500)
    sketch = build_bloom_sketch(corpus, "k", n_words)
    # wrong n_words (a later, larger re-size) and wrong n_hashes
    for bad_words, bad_hashes in [(n_words * 2, 7), (n_words, 5)]:
        with pytest.raises(Exception, match="parameter mismatch"):
            bloom_negative_flag(corpus, sketch, "k", bad_words, bad_hashes).collect()
    # a sketch with no metadata row (hand-built / pre-versioned) also fails
    bare = sketch.filter(F.col("word_idx") >= 0)
    with pytest.raises(Exception, match="parameter mismatch"):
        bloom_negative_flag(corpus, bare, "k", n_words).collect()
    # matching params still pass
    assert bloom_negative_flag(corpus, sketch, "k", n_words).filter(
        F.col("definitely_new")
    ).count() == 0


def test_probe_join_broadcasts(spark):
    documents = load_table(spark, SF_DIR, "documents")
    corpus, batch = _split(documents)
    n_words = sketch_words_for_keys(400)
    sketch = build_bloom_sketch(corpus, "canon", n_words)
    plan = bloom_negative_flag(batch, sketch, "canon", n_words)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
