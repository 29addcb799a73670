"""Persisted inverted index (PostingsStore + streaming/retrieval.py):
store queries bit-identical to the inline operator over the
concatenated corpus, multi-epoch ingestion, replay idempotence,
compaction invisibility + base partition pruning, and the streaming
wrapper end-to-end."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions.retrieval import (
    PostingsStore,
    bm25_topk,
)
from cassandra_iot_pipeline_spark.plans import formatted_plan
from cassandra_iot_pipeline_spark.streaming.retrieval import (
    streaming_postings_ingest,
)
from tests.conftest import SF_DIR

QUERY = "spark join merge window"
DOCS_SCHEMA = "doc_id BIGINT, text STRING"


def _batches(spark):
    """The fixture corpus split into three uneven epochs."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return (
        docs.filter("doc_id < 120"),
        docs.filter("doc_id >= 120 AND doc_id < 390"),
        docs.filter("doc_id >= 390"),
        docs,
    )


def _ranked(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_store_matches_inline_over_concatenation(spark, tmp_path):
    b0, b1, b2, full = _batches(spark)
    store = PostingsStore(str(tmp_path / "ix"), compact_every=2)
    for i, b in enumerate((b0, b1, b2)):
        store.write_batch(b, epoch_id=i)
    for q, k in [(QUERY, 10), ("the", 500), ("data pipeline quality", 5)]:
        got = _ranked(store.bm25_topk(spark, q, k=k))
        want = _ranked(bm25_topk(full, q, k=k))
        assert got == want, q
    n, total = store.stats(spark)
    assert n == full.count()


def test_replay_is_idempotent(spark, tmp_path):
    b0, b1, b2, full = _batches(spark)
    store = PostingsStore(str(tmp_path / "ix"))
    for i, b in enumerate((b0, b1, b2)):
        store.write_batch(b, epoch_id=i)
    before = _ranked(store.bm25_topk(spark, QUERY, k=20))
    n_before = store.stats(spark)
    store.write_batch(b1, epoch_id=1)  # replay
    assert _ranked(store.bm25_topk(spark, QUERY, k=20)) == before
    assert store.stats(spark) == n_before


def test_compaction_invisible_and_prunes(spark, tmp_path):
    b0, b1, b2, full = _batches(spark)
    store = PostingsStore(str(tmp_path / "ix"))
    for i, b in enumerate((b0, b1, b2)):
        store.write_batch(b, epoch_id=i)
    pre = _ranked(store.bm25_topk(spark, QUERY, k=20))
    assert store.compact(spark) == 2
    assert _ranked(store.bm25_topk(spark, QUERY, k=20)) == pre
    # the compacted base is grp-partitioned and the query's grp IN
    # filter lands in PartitionFilters (partition pruning)
    plan = formatted_plan(store.bm25_topk(spark, QUERY, k=20))
    assert "PartitionFilters" in plan
    assert "grp" in plan.split("PartitionFilters", 1)[1][:300]


def test_empty_store_and_empty_query(spark, tmp_path):
    store = PostingsStore(str(tmp_path / "ix"))
    with pytest.raises(ValueError, match="empty postings store"):
        store.bm25_topk(spark, QUERY)
    with pytest.raises(ValueError, match="tokenizes to nothing"):
        store.bm25_topk(spark, "!!!")


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    b0, b1, b2, full = _batches(spark)
    src = tmp_path / "src"
    src.mkdir()
    for i, b in enumerate((b0, b1, b2)):
        pdf = b.toPandas()
        path = str(src / f"b{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_postings_ingest(
        spark,
        str(src),
        DOCS_SCHEMA,
        str(tmp_path / "ix"),
        str(tmp_path / "ckpt"),
        compact_every=2,
    )
    q.awaitTermination()
    store = PostingsStore(str(tmp_path / "ix"))
    got = _ranked(store.bm25_topk(spark, QUERY, k=10))
    want = _ranked(bm25_topk(full, QUERY, k=10))
    assert got == want
