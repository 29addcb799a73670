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


def test_streaming_embedding_dedup_curates(spark, embeddings, tmp_path):
    """The full embedding-curation stream: planted copies of stored and
    in-stream vectors are dropped from the curated output, novel
    vectors admitted, and a crash-replay of the last epoch leaves the
    curated corpus identical (idempotence against the store that
    already holds the batch's own vectors)."""
    from cassandra_iot_pipeline_spark.streaming.ann import (
        EmbeddingDedupPipeline,
        streaming_embedding_dedup,
    )

    boot = embeddings.filter(F.col("vec_id") < 300)
    idx_dir = str(tmp_path / "eidx")
    AnnIndexStore(idx_dir).build(boot, store_vectors=True)

    def copy_of(src_id, new_id):
        return embeddings.filter(F.col("vec_id") == src_id).select(
            F.lit(new_id).cast("long").alias("vec_id"), "embedding", "label"
        )

    src = tmp_path / "esrc"
    src.mkdir()
    # file 1: novel 1000 + a copy of stored vec 5 (1001)
    b1 = copy_of(350, 1000).unionByName(copy_of(5, 1001))
    # file 2: a copy of in-stream-admitted 1000 (2000) + novel 2001
    b2 = copy_of(350, 2000).unionByName(copy_of(360, 2001))
    for name, frame, mtime in (
        ("b1.parquet", b1, 1_700_000_000),
        ("b2.parquet", b2, 1_700_000_010),
    ):
        path = os.path.join(str(src), name)
        pq.write_table(
            pa.Table.from_pandas(frame.toPandas(), preserve_index=False), path
        )
        os.utime(path, (mtime, mtime))

    cur_dir = str(tmp_path / "ecur")
    q = streaming_embedding_dedup(
        spark, str(src), idx_dir, cur_dir, str(tmp_path / "eckpt"),
        threshold=0.999,
    )
    q.awaitTermination()
    pipe = EmbeddingDedupPipeline(idx_dir, cur_dir, threshold=0.999)
    kept = {r["vec_id"] for r in pipe.curated(spark).collect()}
    assert kept == {1000, 2001}

    # crash-replay of stream epoch 1 (file b2): curated unchanged
    pipe.write_batch(
        b2.select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"),
        epoch_id=1,
    )
    assert {r["vec_id"] for r in pipe.curated(spark).collect()} == {1000, 2001}

    # monotone-id guard (same contract as the text pipeline): a NEW
    # epoch carrying ids at or below the ingested max fails loudly
    stale = copy_of(370, 1500)  # 1500 <= 2001, the recorded max
    with pytest.raises(ValueError, match="out of order.*epoch 2"):
        pipe.write_batch(
            stale.select(
                "vec_id",
                F.col("embedding").cast("array<float>").alias("embedding"),
                "label",
            ),
            epoch_id=2,
        )


def test_embedding_curated_compaction_bounds_files(spark, embeddings, tmp_path):
    """The curated output and watermark history fold through the same
    delta+base lifecycle as the index stores: after a compaction
    cadence the curated dir holds one base and no epoch leftovers, the
    read is unchanged, and a post-compaction replay cannot resurrect
    rows (readers ignore epochs at or under the base upto)."""
    from cassandra_iot_pipeline_spark.streaming.ann import EmbeddingDedupPipeline

    boot = embeddings.filter(F.col("vec_id") < 300)
    idx_dir = str(tmp_path / "cidx")
    # int8 verification vectors: the 100 TB-default side-table mode,
    # exercised through the full streaming write path here
    AnnIndexStore(idx_dir).build(boot, store_vectors="int8")
    cur_dir = str(tmp_path / "ccur")
    pipe = EmbeddingDedupPipeline(
        idx_dir, cur_dir, threshold=0.999, compact_every=2
    )
    slices = [(300, 320), (320, 340), (340, 360), (360, 380)]
    for e, (lo, hi) in enumerate(slices):
        batch = embeddings.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        pipe.write_batch(batch, epoch_id=e)
    dirs = sorted(os.path.basename(p) for p in glob.glob(cur_dir + "/*"))
    assert dirs == ["base_upto=3"], dirs
    wm_dirs = sorted(
        os.path.basename(p) for p in glob.glob(pipe.watermark_dir + "/*")
    )
    assert wm_dirs == ["epoch=3"], wm_dirs
    before = sorted(r["vec_id"] for r in pipe.curated(spark).collect())
    assert before == list(range(300, 380))  # novel slices all admitted
    # post-compaction replay of a folded epoch: read unchanged
    pipe.write_batch(
        embeddings.filter(
            (F.col("vec_id") >= 340) & (F.col("vec_id") < 360)
        ),
        epoch_id=2,
    )
    assert sorted(r["vec_id"] for r in pipe.curated(spark).collect()) == before


def test_bootstrap_defaults_to_int8(spark, embeddings, tmp_path):
    """r5 verdict item #6: the dedup-shaped entry point builds the
    verification side table in 'int8' mode by DEFAULT (the 100 TB
    posture), the pipeline over it drops a planted dup, and
    full-precision stays one argument away."""
    from cassandra_iot_pipeline_spark.streaming.ann import EmbeddingDedupPipeline

    boot = embeddings.filter(F.col("vec_id") < 300)
    pipe = EmbeddingDedupPipeline.bootstrap(
        boot, str(tmp_path / "bidx"), str(tmp_path / "bcur"), threshold=0.999
    )
    assert pipe.store.meta(spark)["vector_mode"] == "int8"
    dup = embeddings.filter(F.col("vec_id") == 5).select(
        F.lit(1000).cast("long").alias("vec_id"), "embedding", "label"
    )
    novel = embeddings.filter(F.col("vec_id") == 350).select(
        F.lit(1001).cast("long").alias("vec_id"), "embedding", "label"
    )
    pipe.write_batch(dup.unionByName(novel), epoch_id=0)
    assert sorted(
        r["vec_id"] for r in pipe.curated(spark).collect()
    ) == [1001]
    full = EmbeddingDedupPipeline.bootstrap(
        boot, str(tmp_path / "fidx"), str(tmp_path / "fcur"),
        store_vectors="full",
    )
    assert full.store.meta(spark)["vector_mode"] == "full"


def test_embedding_replay_does_not_displace_shortlist(spark, embeddings, tmp_path):
    """Crash between add_batch and checkpoint commit: the replayed
    batch re-probes a store holding its own vectors. An identical copy
    maximizes ADC, so with a tight shortlist it would displace the
    genuine near-dup candidate — the pre-cap ``cand_id < batch min``
    filter removes the replayed copies instead, making replay survivors
    exactly the first attempt's."""
    boot = embeddings.filter(F.col("vec_id") < 300)
    idx_dir = str(tmp_path / "ridx")
    store = AnnIndexStore(idx_dir)
    store.build(boot, store_vectors=True)

    batch = embeddings.filter(F.col("vec_id") == 5).select(
        F.lit(1000).cast("long").alias("vec_id"), "embedding"
    )
    first = store.near_dup_batch(batch, threshold=0.999, shortlist=1)
    assert first.survivors.count() == 0  # dup of stored vec 5 — dropped

    store.add_batch(batch, epoch_id=1)  # crash happened after this
    replay = store.near_dup_batch(batch, threshold=0.999, shortlist=1)
    # without the bound filter, the batch's own stored copy (ADC max)
    # fills the 1-slot shortlist, the self-pair is discarded, and the
    # replay would admit a vector the first attempt dropped
    assert replay.survivors.count() == 0
