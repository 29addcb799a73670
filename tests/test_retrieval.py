"""BM25 retrieval (functions/retrieval.py): hand-computed scores on a
tiny corpus, bitwise fixture parity for postings and full score
lists, the two cross-engine exactness pins the module's contract
stands on (CPython log == DuckDB ln; DuckDB ordered SUM == sequential
fold), degenerate queries, and the top-k plan shape."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions import retrieval as R
from cassandra_iot_pipeline_spark.plans import formatted_plan
from tests.conftest import SF_DIR
from tools.oracle_check import compare

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "apple apple apple durian"),
    (3, "elderberry"),
]


def _frame(spark):
    return spark.createDataFrame(DOCS, "doc_id BIGINT, text STRING")


def _hand_bm25(query_terms, k1=1.2, b=0.75):
    """Scalar-python BM25 over DOCS — the from-scratch twin."""
    toks = {i: t.split() for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, ts in toks.items():
        score = 0.0
        for term in sorted(set(query_terms)):
            tf = ts.count(term)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            w = (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(ts) / avgdl)
            )
            score += idf * w
        if score:
            out[i] = score
    return out


def test_hand_computed_scores(spark):
    got = {
        r["doc_id"]: r["score"]
        for r in R.bm25_topk(_frame(spark), "apple banana", k=10).collect()
    }
    assert got == _hand_bm25(["apple", "banana"])
    # tf saturation: doc 2 (3x apple) outranks doc 0 (2x apple +
    # banana) on the single-term query but not on the two-term one
    single = R.bm25_topk(_frame(spark), "apple", k=1).collect()[0]
    assert single["doc_id"] == 2


def test_absent_and_empty_queries(spark):
    df = _frame(spark)
    assert R.bm25_topk(df, "zzz qqq", k=5).count() == 0
    with pytest.raises(ValueError):
        R.bm25_topk(df, "...!!!", k=5)


def test_fixture_postings_parity(spark, duck):
    docs = load_table(spark, SF_DIR, "documents")
    got = R.postings(docs).toPandas()
    want = duck.sql(R.postings_oracle()).df()
    assert compare(got, want) == []
    assert len(got) > 1000


def test_fixture_score_parity(spark, duck):
    """Bitwise-equal scores for the ENTIRE ranked list (k = corpus),
    plus small-k top slices, across single- and multi-term queries."""
    docs = load_table(spark, SF_DIR, "documents")
    for q, k in [
        ("the", 10_000),                      # stopword: every posting
        ("spark join merge window", 25),
        ("data pipeline quality", 10),
        ("customer's order", 10),             # apostrophe in a term
    ]:
        got = R.bm25_topk(docs, q, k=k).toPandas()
        want = duck.sql(R.bm25_oracle(q, k=k)).df()
        assert compare(got, want) == [], q


def test_log_bitwise_pin(duck):
    """The contract's transcendental seam: CPython math.log must be
    bitwise equal to DuckDB ln (the idf is computed driver-side so
    the JVM's 1-ulp-different Math.log never runs)."""
    rng = np.random.default_rng(11)
    xs = (np.abs(rng.lognormal(0, 6, size=5000)) + 1e-300).tolist()
    duck_vals = duckdb.sql(
        "SELECT ln(x) FROM (SELECT unnest(?) AS x)", params=[xs]
    ).fetchnumpy()
    a = next(iter(duck_vals.values()))
    b = np.array([math.log(x) for x in xs])
    assert (a == b).all()


def test_ordered_sum_is_sequential_fold():
    """DuckDB's SUM(x ORDER BY i) must equal a left-to-right IEEE
    fold — the oracle's mirror of the Spark-side aggregate() fold."""
    rng = np.random.default_rng(13)
    vals = (rng.normal(size=3000) * rng.lognormal(2, 5, size=3000)).tolist()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS x,"
        " unnest(range(?)) AS i)",
        [vals, len(vals)],
    )
    got = con.execute("SELECT SUM(x ORDER BY i) FROM t").fetchone()[0]
    acc = 0.0
    for v in vals:
        acc += v
    assert got == acc


def test_tokenize_query_matches_corpus_tokenizer(spark):
    """Driver-side query tokenization and the Column-level corpus
    tokenizer agree on a torture string."""
    s = "Hello, WORLD!  it's A-B_c 42x  --- 'quoted'"
    from pyspark.sql import functions as F
    from cassandra_iot_pipeline_spark.functions.text import tokens

    corpus = (
        spark.createDataFrame([(s,)], "text STRING")
        .select(F.explode(tokens(F.col("text"))).alias("t"))
        .collect()
    )
    assert sorted({r["t"] for r in corpus}) == R.tokenize_query(s)


QUERIES = [
    (1, "spark join merge window"),
    (2, "data pipeline quality"),
    (3, "the customer order"),
    (4, "zzz absent terms"),
]


@pytest.fixture()
def duck_queries(duck):
    import pandas as pd

    duck.register(
        "queries", pd.DataFrame(QUERIES, columns=["query_id", "query_text"])
    )
    return duck


def _qframe(spark):
    return spark.createDataFrame(QUERIES, "query_id BIGINT, query_text STRING")


def test_batch_parity_and_consistency(spark, duck_queries):
    """bm25_batch bitwise-matches its oracle AND agrees with the
    single-query operator per query (same scores, same ranking)."""
    docs = load_table(spark, SF_DIR, "documents")
    got = R.bm25_batch(docs, _qframe(spark), k=7).toPandas()
    want = duck_queries.sql(R.bm25_batch_oracle(k=7)).df()
    assert compare(got, want) == []
    # query 4 has no corpus terms: no rows at all
    assert (got.query_id == 4).sum() == 0
    # per-query agreement with bm25_topk
    for qid, qtext in QUERIES[:3]:
        single = R.bm25_topk(docs, qtext, k=7).toPandas()
        batch = (
            got[got.query_id == qid]
            .sort_values("rank")[["doc_id", "score"]]
            .reset_index(drop=True)
        )
        assert batch.doc_id.tolist() == single.doc_id.tolist(), qid
        assert (batch.score.to_numpy() == single.score.to_numpy()).all()


def test_decontaminate_parity_and_threshold(spark, duck_queries):
    docs = load_table(spark, SF_DIR, "documents")
    got = R.retrieval_decontaminate(
        docs, _qframe(spark), k=5, min_score=0.5
    ).toPandas()
    want = duck_queries.sql(
        R.retrieval_decontaminate_oracle(k=5, min_score=0.5)
    ).df()
    assert compare(got, want) == []
    assert got.doc_id.is_unique
    assert (got.best_score >= 0.5).all()


def test_batch_routing_is_broadcast(spark):
    """The posting side never reshuffles for query routing: both the
    query-term and idf joins are broadcast."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = formatted_plan(R.bm25_batch(docs, _qframe(spark), k=5))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_topk_plan_shape(spark):
    """The ranked read compiles to TakeOrderedAndProject and the
    query-term IN filter sits below the posting aggregation."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = formatted_plan(R.bm25_topk(docs, "spark window", k=5))
    assert "TakeOrderedAndProject" in plan
