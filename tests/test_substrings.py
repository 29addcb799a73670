"""Substring-level dedup (functions/substrings.py): hand-computed
spans on a planted corpus, DuckDB bitwise parity at fixture scale, the
span cut vs a pure-Python reference, and the plan shape."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions import substrings
from tests.conftest import SF_DIR
from tools.oracle_check import compare

SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)], SCHEMA
    )


def _rand(n, seed):
    rng = random.Random(seed)
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


def test_planted_spans_hand_computed(spark):
    """A 60-char boilerplate block shared by docs 0 and 1 (at different
    offsets), absent from doc 2 — each sharer gets exactly one maximal
    span covering the block, doc 2 gets nothing."""
    boiler = _rand(60, seed=1)
    a_head = _rand(10, seed=2)
    b_head = _rand(25, seed=3)
    texts = [
        a_head + boiler + _rand(30, seed=4),
        b_head + boiler + _rand(15, seed=5),
        _rand(120, seed=6),
    ]
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in substrings.duplicated_spans(_docs(spark, texts), k=40).collect()
    }
    # every k-window inside the 60-char block repeats across docs; the
    # merged span is exactly the block at each doc's offset
    assert got == {0: (11, 71), 1: (26, 86)}


def test_within_doc_repeats_count(spark):
    """min_count counts ALL occurrences (the paper's semantics): one
    doc repeating its own 50-char run still gets both copies marked."""
    run = _rand(50, seed=7)
    text = run + _rand(40, seed=8) + run
    got = sorted(
        tuple(r)
        for r in substrings.duplicated_spans(
            _docs(spark, [text]), k=40
        ).collect()
    )
    assert got == [(0, 1, 51), (0, 91, 141)]


def test_fixture_duckdb_parity(spark, duck):
    documents = load_table(spark, SF_DIR, "documents")
    for k, mc in ((20, 2), (12, 3)):
        spark_pdf = substrings.duplicated_spans(documents, k, mc).toPandas()
        oracle_pdf = duck.sql(substrings.duplicated_spans_oracle(k, mc)).df()
        assert compare(spark_pdf, oracle_pdf) == [], (k, mc)
    # the fixture's planted near-dups guarantee the operator is
    # exercised, not vacuously equal on empty frames
    assert len(spark_pdf) > 0


def test_hash_shuffle_tier_matches_exact(spark):
    """The 16-bytes-per-row hashed shuffle tier produces the exact
    tier's spans on the fixture corpus (no xxhash64 collisions at this
    gram count, as the w.h.p. contract predicts)."""
    documents = load_table(spark, SF_DIR, "documents")
    exact = sorted(
        tuple(r) for r in substrings.duplicated_spans(documents, 20).collect()
    )
    hashed = sorted(
        tuple(r)
        for r in substrings.duplicated_spans(
            documents, 20, hash_shuffle=True
        ).collect()
    )
    assert exact == hashed and len(exact) > 0


def test_remove_spans_matches_reference(spark):
    """The expression-fold cut equals the Python reference on random
    corpora with real shared runs (and leaves span-free docs at their
    canonical form)."""
    from cassandra_iot_pipeline_spark.functions.dedup import canonical

    rng = random.Random(42)
    shared = [_rand(55, seed=100 + j) for j in range(3)]
    texts = []
    for i in range(12):
        parts = [_rand(rng.randrange(10, 40), seed=200 + i)]
        for j in range(3):
            if rng.random() < 0.6:
                parts.append(shared[j])
                parts.append(_rand(rng.randrange(5, 25), seed=300 + 10 * i + j))
        texts.append(" ".join(parts).upper())  # canonicalization is real
    docs = _docs(spark, texts)
    k = 40
    spans = {}
    for r in substrings.duplicated_spans(docs, k).collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    canon = {
        r["doc_id"]: r["c"]
        for r in docs.select("doc_id", canonical(F.col("text")).alias("c")).collect()
    }
    want = {
        d: substrings.remove_spans_reference(canon[d], spans.get(d, []))
        for d in canon
    }
    got = {
        r["doc_id"]: r["text"]
        for r in substrings.remove_duplicated_spans(docs, k).collect()
    }
    assert got == want
    assert any(spans.values())  # the corpus really had duplicated runs


def test_dup_join_modes_agree(spark):
    """All four dup-gram strategies (auto / pinned broadcast / pinned
    shuffle-hash / legacy window) select identical positions, hence
    identical spans — they evaluate the same cnt >= min_count
    predicate through different physical plans."""
    documents = load_table(spark, SF_DIR, "documents")
    want = None
    for mode in substrings.DUP_JOIN_MODES:
        got = sorted(
            tuple(r)
            for r in substrings.duplicated_spans(
                documents, 20, dup_join=mode
            ).collect()
        )
        if want is None:
            want = got
        assert got == want, mode
    assert want  # the fixture really produced spans


def test_dup_join_rejects_unknown_mode(spark):
    import pytest

    documents = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="dup_join"):
        substrings.duplicated_spans(documents, 20, dup_join="bogus")


def test_plan_shape(spark):
    """The r7 de-skewed plan: dup-gram counts come from a partial
    HashAggregate (hot grams collapse map-side before the exchange),
    membership is a LeftSemi join that AQE broadcast-converts at this
    scale, and NO window operator partitions on the gram — the
    pre-r7 full-corpus Sort+Window on g is gone. The two remaining
    Window nodes are the per-doc span merge (partitioned by doc_id)."""
    documents = load_table(spark, SF_DIR, "documents")
    df = substrings.duplicated_spans(documents, 20)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    # count pass + probe pass: two narrow scans replace the k-fold
    # full-corpus wide stage
    assert final.count("Scan parquet") == 2
    assert "partial_count" in final
    assert "BroadcastHashJoin" in final and "LeftSemi" in final
    # no window keyed on the gram column
    assert "windowspecdefinition(g#" not in final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
