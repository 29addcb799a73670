"""Streaming ingest dedup (streaming/dedup.py).

Scenario: an at-least-once source redelivers events — duplicates appear
both inside a micro-batch and across micro-batches. dedup_within_watermark must
land each event_id exactly once in a plain append-only sink (no PK
upsert helping), matching the batch distinct-by-key result.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.streaming.dedup import dedup_within_watermark
from tests.conftest import SF_DIR

D1 = dt.datetime(2024, 1, 1, 8, 0, 0)
D2 = dt.datetime(2024, 1, 2, 8, 0, 0)
D3 = dt.datetime(2024, 1, 3, 8, 0, 0)


def _write_file(path: str, rows: list[tuple[int, dt.datetime, float]], mtime: float):
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_streaming_dedup_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: e1..e3 plus an in-batch redelivery of e2
    _write_file(
        str(src / "b1.parquet"),
        [(1, D1, 1.0), (2, D1, 2.0), (2, D1, 2.0), (3, D1, 3.0)],
        mtime=1_700_000_000,
    )
    # batch 2: e4, e5 plus a cross-batch redelivery of e3
    _write_file(
        str(src / "b2.parquet"),
        [(4, D2, 4.0), (3, D1, 3.0), (5, D2, 5.0)],
        mtime=1_700_000_010,
    )
    # batch 3: e6 plus cross-batch redeliveries of e4 and e1
    _write_file(
        str(src / "b3.parquet"),
        [(6, D3, 6.0), (4, D2, 4.0), (1, D1, 1.0)],
        mtime=1_700_000_020,
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = str(tmp_path / "out")
    # redelivery horizon: 5 days of event time covers every dup above —
    # dedup state for an event_id survives until the watermark passes it
    q = (
        dedup_within_watermark(stream, keys=("event_id",), ts_col="ts", delay="5 days")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == 6  # nine input rows, three of them redeliveries
    assert {r["event_id"] for r in got.collect()} == {1, 2, 3, 4, 5, 6}
    # values intact (dedup dropped whole rows, not columns)
    assert got.filter(F.col("event_id") == 2).first()["value"] == 2.0


def test_streaming_dedup_state_evicts_after_watermark(spark, tmp_path):
    """With a short horizon, a redelivery arriving long after the
    watermark passed the original is NOT suppressed — documenting that
    ``delay`` is the guarantee boundary (state has been evicted)."""
    src = tmp_path / "src"
    src.mkdir()
    _write_file(str(src / "b1.parquet"), [(1, D1, 1.0)], mtime=1_700_000_000)
    # the watermark advances only between batches, and a batch's state
    # cleanup runs after its dedup lookups — so key 1 (expiry D1+1min)
    # is evicted while processing b3, under the watermark b2 advanced
    _write_file(str(src / "b2.parquet"), [(2, D2, 2.0)], mtime=1_700_000_010)
    _write_file(
        str(src / "b3.parquet"),
        [(3, D2 + dt.timedelta(hours=1), 3.0)],
        mtime=1_700_000_020,
    )
    # the redelivery carries a fresh ts (still "on time"), arriving
    # after key 1's state is gone -> re-emitted
    _write_file(str(src / "b4.parquet"), [(1, D3, 9.0)], mtime=1_700_000_030)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = str(tmp_path / "out")
    q = (
        dedup_within_watermark(stream, keys=("event_id",), ts_col="ts", delay="1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # event 1 appears twice: once from b1, once re-emitted in b2
    got = spark.read.parquet(out)
    assert got.filter(F.col("event_id") == 1).count() == 2


# --- streaming near-dup dedup -----------------------------------------------


def _stage_documents(spark, src_dir: str, n_batches: int = 3):
    """Stage the sf0.001 documents + planted near-dup copies as
    ascending doc_id-range files (ingest order by mtime)."""
    from cassandra_iot_pipeline_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    perturbed = docs.limit(5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars"),
    )
    corpus = docs.unionByName(perturbed).cache()
    n = corpus.agg(F.max("doc_id")).first()[0] + 1
    batches = []
    for k in range(n_batches):
        b = corpus.filter(
            (F.col("doc_id") * n_batches / n).cast("int") == F.lit(k)
        ).cache()
        batches.append(b)
        pdf = b.toPandas()
        path = os.path.join(src_dir, f"b{k}.parquet")
        pa_table = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(pa_table, path)
        os.utime(path, (1_700_000_000 + 10 * k,) * 2)
    return corpus, batches


def test_streaming_near_dedup_matches_batch_replay(spark, tmp_path):
    """availableNow replay of staged document files through the
    foreachBatch near-dup pipeline == near_dedup_replay over the same
    batches (same survivors, batch-mode ground truth)."""
    from cassandra_iot_pipeline_spark.functions.incremental import (
        near_dedup_replay,
    )
    from cassandra_iot_pipeline_spark.streaming.dedup import (
        NearDedupPipeline,
        streaming_near_dedup,
    )

    src = tmp_path / "docs_src"
    src.mkdir()
    corpus, batches = _stage_documents(spark, str(src))
    q = streaming_near_dedup(
        spark,
        str(src),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        threshold=0.7,
    )
    q.awaitTermination()
    got = {
        r.doc_id
        for r in NearDedupPipeline(str(tmp_path / "store"))
        .curated(spark)
        .collect()
    }
    expect = {
        r.doc_id
        for r in near_dedup_replay(batches, threshold=0.7)
        .select("doc_id")
        .collect()
    }
    assert got == expect
    # the planted copies were dropped somewhere along the replay
    assert not any(d >= 200000 for d in got)


def test_streaming_near_dedup_epoch_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: calling write_batch twice with the
    same epoch (the crash-replay case) leaves stores and curated output
    identical — epoch-dir overwrite + self-collision filtering."""
    from cassandra_iot_pipeline_spark.streaming.dedup import NearDedupPipeline

    src = tmp_path / "docs_src2"
    src.mkdir()
    _, batches = _stage_documents(spark, str(src))
    pipe = NearDedupPipeline(str(tmp_path / "store2"), threshold=0.7)
    pipe.write_batch(batches[0], epoch_id=0)
    first = sorted(
        r.doc_id for r in pipe.curated(spark).collect()
    )
    pipe.write_batch(batches[0], epoch_id=0)  # crash-replay of epoch 0
    second = sorted(r.doc_id for r in pipe.curated(spark).collect())
    assert first == second
    # and the band store carries exactly one delta set, not two
    import glob

    assert len(glob.glob(str(tmp_path / "store2" / "bands" / "epoch=*"))) == 1


def test_streaming_near_dedup_resumes_from_checkpoint(spark, tmp_path):
    """W5 for the curation pipeline: stop after the first staged files,
    stage more, restart with the same checkpoint — the second run
    processes only the new files (epoch ids advance, no re-landing) and
    the final curated corpus equals the single-run result."""
    from cassandra_iot_pipeline_spark.streaming.dedup import (
        NearDedupPipeline,
        streaming_near_dedup,
    )

    src = tmp_path / "docs_src3"
    src.mkdir()
    corpus, batches = _stage_documents(spark, str(src), n_batches=3)
    # hide batch 3's file for the first run
    hidden = tmp_path / "hidden"
    hidden.mkdir()
    b2 = src / "b2.parquet"
    b2.rename(hidden / "b2.parquet")

    store, ckpt = str(tmp_path / "store3"), str(tmp_path / "ckpt3")
    q = streaming_near_dedup(spark, str(src), store, ckpt, threshold=0.7)
    q.awaitTermination()
    first_ids = {
        r.doc_id for r in NearDedupPipeline(store).curated(spark).collect()
    }

    (hidden / "b2.parquet").rename(b2)
    os.utime(str(b2), (1_700_000_020,) * 2)
    q2 = streaming_near_dedup(spark, str(src), store, ckpt, threshold=0.7)
    q2.awaitTermination()
    final_ids = {
        r.doc_id for r in NearDedupPipeline(store).curated(spark).collect()
    }

    # resumed run only added batch-3 survivors on top of the first run
    assert first_ids <= final_ids
    from cassandra_iot_pipeline_spark.functions.incremental import (
        near_dedup_replay,
    )

    expect = {
        r.doc_id
        for r in near_dedup_replay(batches, threshold=0.7)
        .select("doc_id")
        .collect()
    }
    assert final_ids == expect
