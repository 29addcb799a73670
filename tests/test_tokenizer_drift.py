"""Continuous tokenizer-drift monitoring (streaming/tokenizer_drift
.py): per-epoch reports equal the batch operator on each epoch's own
documents, a planted vocabulary-drift epoch surfaces at exactly its
epoch in the alert view, replay idempotence, compaction invisibility,
and the wrapper e2e."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from cassandra_iot_pipeline_spark.functions.bpe import (
    bpe_train,
    bpe_vocab,
    bpe_word_counts,
    tokenizer_report,
)
from cassandra_iot_pipeline_spark.streaming.tokenizer_drift import (
    TokenizerDriftPipeline,
    streaming_tokenizer_drift,
)

SCHEMA = "doc_id BIGINT, text STRING, source STRING"

TRAIN_TEXTS = [
    "the fast sort runs the table scan",
    "the table scan merges the fast sort",
    "fast sorts run fast tables",
]

BATCHES = [
    # epoch 0: in-distribution
    [(1, "the fast table", "web"), (2, "the sort runs", "web")],
    # epoch 1: still fine
    [(3, "fast scan merges", "web")],
    # epoch 2: drifted — unseen vocabulary (char-level fertility) and
    # out-of-alphabet letters (OOV). NOTE the Cyrillic doc: the
    # tokenizer contract is [a-z0-9']+ runs, so a non-Latin script
    # contributes ZERO words — script shift shows up as an n_words
    # cliff, not as OOV; the zzz/qqq/jjj words carry the OOV signal
    # (z, q, j are absent from the training alphabet)
    [(4, "zzz qqq jjj", "web"), (5, "пример текст", "web")],
]


def _model(spark):
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN_TEXTS)],
        "doc_id BIGINT, text STRING",
    )
    wc = bpe_word_counts(train)
    # train to saturation: every training word one piece, so the
    # in-distribution epochs sit at fertility exactly 1.0
    m = bpe_train(wc, 60, min_count=1)
    return m.merges, bpe_vocab(wc, m.merges)


def _frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _h(df):
    return sorted(tuple(r) for r in df.collect())


def test_epoch_reports_equal_batch_operator(spark, tmp_path):
    merges, vocab = _model(spark)
    pipe = TokenizerDriftPipeline(
        str(tmp_path / "s"), merges, vocab, compact_every=2
    )
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    hist = pipe.history(spark)
    assert hist.count() == 3  # one (epoch, source) row each
    for i, rows in enumerate(BATCHES):
        want = tokenizer_report(
            _frame(spark, rows), merges, vocab
        ).collect()[0]
        got = hist.filter(f"epoch = {i}").collect()[0]
        assert tuple(got)[1:] == tuple(want), i


def test_drift_alert_fires_at_the_drifted_epoch(spark, tmp_path):
    merges, vocab = _model(spark)
    pipe = TokenizerDriftPipeline(str(tmp_path / "s"), merges, vocab)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    alerts = pipe.drift(spark).collect()
    assert [r["epoch"] for r in alerts] == [2]
    a = alerts[0]
    assert a["oov_word_rate"] > a["baseline_oov"]
    assert a["fertility"] > a["baseline_fertility"]


def test_replay_and_compaction_invisible(spark, tmp_path):
    merges, vocab = _model(spark)
    pipe = TokenizerDriftPipeline(str(tmp_path / "s"), merges, vocab)
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    before = _h(pipe.history(spark))
    pipe.write_batch(_frame(spark, BATCHES[1]), epoch_id=1)  # replay
    assert _h(pipe.history(spark)) == before
    assert pipe.compact(spark) == 2
    assert _h(pipe.history(spark)) == before


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    merges, vocab = _model(spark)
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        table = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        path = str(src / f"b{i}.parquet")
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_tokenizer_drift(
        spark,
        str(src),
        SCHEMA,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        merges,
        vocab,
    )
    q.awaitTermination()
    pipe = TokenizerDriftPipeline(str(tmp_path / "store"), merges, vocab)
    assert pipe.history(spark).count() == 3
    got = pipe.drift(spark).collect()
    assert [r["epoch"] for r in got] == [2]
