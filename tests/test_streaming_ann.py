"""Streaming ANN ingestion (streaming/ann.py): embedding micro-batches
land in the persisted IVFADC index with the same guarantees as the
batch form — codes bit-identical to a single-shot build+add (immutable
codebook), checkpoint-resume processes only new files, compaction on
cadence, unbuilt index fails loudly."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions.ann_store import AnnIndexStore
from cassandra_iot_pipeline_spark.streaming.ann import streaming_ann_ingest
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def _stage(embeddings, src_dir, lo, hi, name, mtime):
    pdf = embeddings.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).toPandas()
    path = os.path.join(src_dir, name)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    os.utime(path, (mtime, mtime))


def _codes(spark, store):
    return sorted(
        (r["vec_id"], r["lst"], tuple(r["codes"]))
        for r in store.codes(spark).collect()
    )


def test_streamed_ingest_equals_batch_add(spark, embeddings, tmp_path):
    """Bootstrap build on the first 200 vectors, stream the rest as two
    staged files: the store's codes equal a single-shot build + one
    add_batch over the same split, and queries answer identically."""
    src = tmp_path / "src"
    src.mkdir()
    _stage(embeddings, str(src), 200, 350, "b0.parquet", 1_700_000_000)
    _stage(embeddings, str(src), 350, 500, "b1.parquet", 1_700_000_010)
    boot = embeddings.filter(F.col("vec_id") < 200)

    streamed = AnnIndexStore(str(tmp_path / "s_idx"))
    streamed.build(boot)
    q = streaming_ann_ingest(
        spark, str(src), str(tmp_path / "s_idx"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    batch = AnnIndexStore(str(tmp_path / "b_idx"))
    batch.build(boot)
    batch.add_batch(embeddings.filter(F.col("vec_id") >= 200), epoch_id=1)

    assert _codes(spark, streamed) == _codes(spark, batch)
    queries = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(map(tuple, streamed.topk(queries, corpus=embeddings).collect()))
    want = sorted(map(tuple, batch.topk(queries, corpus=embeddings).collect()))
    assert got == want and len(got) == 50


def test_resume_processes_only_new_files_and_compacts(spark, embeddings, tmp_path):
    """W5 for the index: stop, stage another file, resume with the same
    checkpoint — epochs advance without re-landing, and the
    compact_every cadence folds the deltas into the lst-partitioned
    base with answers unchanged."""
    src = tmp_path / "src2"
    src.mkdir()
    _stage(embeddings, str(src), 200, 300, "b0.parquet", 1_700_000_000)
    boot = embeddings.filter(F.col("vec_id") < 200)
    idx_dir = str(tmp_path / "idx2")
    store = AnnIndexStore(idx_dir)
    store.build(boot)
    ckpt = str(tmp_path / "ckpt2")
    streaming_ann_ingest(spark, str(src), idx_dir, ckpt).awaitTermination()
    n_after_first = len(_codes(spark, store))

    _stage(embeddings, str(src), 300, 500, "b1.parquet", 1_700_000_010)
    streaming_ann_ingest(
        spark, str(src), idx_dir, ckpt, compact_every=2
    ).awaitTermination()
    codes = _codes(spark, store)
    assert len(codes) == embeddings.count()
    assert len(codes) > n_after_first
    assert len({v for v, _, _ in codes}) == len(codes)  # no re-landed dups
    # the second run's epoch (stream 1 -> store 2) triggered the fold
    assert glob.glob(os.path.join(idx_dir, "codes", "base_upto=*"))
    assert not glob.glob(os.path.join(idx_dir, "codes", "epoch=*"))


def test_unbuilt_index_fails_loudly(spark, embeddings, tmp_path):
    """Streaming into a directory with no built index raises (no silent
    codebook derivation from an arbitrary first micro-batch)."""
    src = tmp_path / "src3"
    src.mkdir()
    _stage(embeddings, str(src), 0, 50, "b0.parquet", 1_700_000_000)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException, StreamingQueryException

    q = streaming_ann_ingest(
        spark, str(src), str(tmp_path / "never_built"), str(tmp_path / "ckpt3")
    )
    with pytest.raises(
        (StreamingQueryException, AnalysisException, Py4JJavaError)
    ):
        q.awaitTermination()
