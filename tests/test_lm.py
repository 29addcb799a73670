"""LM perplexity scoring: DuckDB parity (tolerance — log/exp are the
one place bitwise cross-engine equality is off the table), partition
invariance (quantized log-units), ranking semantics, CCNet buckets."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table, table_path
from cassandra_iot_pipeline_spark.functions.lm import (
    ALPHA,
    bigram_model,
    lm_perplexity,
    perplexity_buckets,
)
from cassandra_iot_pipeline_spark.functions.text import _oracle_tokens
from tests.conftest import SF_DIR


def _spark_scores(spark):
    documents = load_table(spark, SF_DIR, "documents")
    bigrams, contexts, vocab = bigram_model(documents)
    return lm_perplexity(documents, bigrams, contexts, vocab), vocab


DUCK_SQL = """
    WITH tok AS (
        SELECT doc_id, {toks} AS t FROM documents
    ),
    bi AS (
        SELECT doc_id, z[1] AS w1, z[2] AS w2
        FROM (
            SELECT doc_id,
                   unnest(list_zip(t[1:len(t) - 1], t[2:len(t)])) AS z
            FROM tok WHERE len(t) >= 2
        )
    ),
    bigrams AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
    contexts AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT w) AS vocab FROM (
        SELECT unnest(t) AS w FROM tok)),
    scored AS (
        SELECT bi.doc_id,
               ln((COALESCE(bg.c12, 0) + {alpha})
                  / (COALESCE(cx.c1, 0) + {alpha} * v.vocab)) AS lp
        FROM bi
        LEFT JOIN bigrams bg USING (w1, w2)
        LEFT JOIN contexts cx USING (w1)
        CROSS JOIN v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams, SUM(lp) AS logprob,
           exp(-SUM(lp) / COUNT(*)) AS ppl
    FROM scored GROUP BY doc_id
"""


def test_duckdb_parity(spark):
    got, _ = _spark_scores(spark)
    gpdf = got.toPandas().set_index("doc_id").sort_index()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{table_path(SF_DIR, 'documents')}')"
    )
    opdf = (
        con.execute(DUCK_SQL.format(toks=_oracle_tokens("text"), alpha=ALPHA))
        .fetchdf()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(gpdf.index) == list(opdf.index)
    assert (gpdf.n_bigrams == opdf.n_bigrams).all()
    # quantization to 1e-9 log-units + engine log() ulp differences:
    # absolute slack n_bigrams * 1e-9 on logprob, relative on ppl
    assert (abs(gpdf.logprob - opdf.logprob) <= gpdf.n_bigrams * 2e-9).all()
    assert (abs(gpdf.ppl - opdf.ppl) / opdf.ppl < 1e-9).all()


def test_partition_invariance(spark):
    documents = load_table(spark, SF_DIR, "documents")
    bigrams, contexts, vocab = bigram_model(documents)
    a = lm_perplexity(documents, bigrams, contexts, vocab).collect()
    b = lm_perplexity(
        documents.repartition(13), bigrams.repartition(7), contexts, vocab
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_in_domain_scores_lower_than_gibberish(spark):
    """A document assembled from corpus text must be less surprising
    than one of unseen tokens — the property the CCNet filter uses."""
    documents = load_table(spark, SF_DIR, "documents")
    bigrams, contexts, vocab = bigram_model(documents)
    sample_text = documents.select("text").head()[0]
    probe = spark.createDataFrame(
        [(1, sample_text), (2, "qzx wvq jjkp zzyx mmnb qqrr ttuu")],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r.ppl
        for r in lm_perplexity(probe, bigrams, contexts, vocab).collect()
    }
    assert rows[1] < rows[2]


def test_buckets_partition_and_order(spark):
    got, _ = _spark_scores(spark)
    buckets = perplexity_buckets(got).collect()
    by = {}
    for r in buckets:
        by.setdefault(r.bucket, []).append(r.ppl)
    assert set(by) == {"head", "middle", "tail"}
    assert max(by["head"]) <= min(by["middle"]) or pytest.approx(
        max(by["head"])
    ) == min(by["middle"])
    assert max(by["middle"]) <= min(by["tail"])
    n = len(buckets)
    assert abs(len(by["head"]) - n / 3) < n * 0.05
