"""The monitoring loop, closed by execution (r8 verdict item #4):
cusum_changepoints consumes the ACTUAL output frames of the three
monitor-store families it was built to read — TokenizerDriftPipeline
.history(), EmbeddingDriftPipeline.history(), AuditPipeline.history()
— so the column contract between monitors and detector is pinned by a
running test, not prose. Each test plants a level shift in the
monitored corpus and asserts CUSUM alarms at exactly its epoch."""

from __future__ import annotations

import math

from cassandra_iot_pipeline_spark.functions import expectations as X
from cassandra_iot_pipeline_spark.functions.bpe import (
    bpe_train,
    bpe_vocab,
    bpe_word_counts,
)
from cassandra_iot_pipeline_spark.operators.changepoints import (
    cusum_changepoints,
)
from cassandra_iot_pipeline_spark.streaming.audit import AuditPipeline
from cassandra_iot_pipeline_spark.streaming.embedding_drift import (
    EmbeddingDriftPipeline,
)
from cassandra_iot_pipeline_spark.streaming.tokenizer_drift import (
    TokenizerDriftPipeline,
)


def test_cusum_over_tokenizer_drift_series(spark, tmp_path):
    """Fertility series from the tokenizer monitor's own store: three
    saturated epochs (fertility exactly 1.0), then unseen vocabulary —
    CUSUM alarms 'up' at the first drifted epoch, once."""
    train = spark.createDataFrame(
        [
            (0, "the fast sort runs the table scan"),
            (1, "the table scan merges the fast sort"),
        ],
        "doc_id BIGINT, text STRING",
    )
    wc = bpe_word_counts(train)
    model = bpe_train(wc, 60, min_count=1)
    merges, vocab = model.merges, bpe_vocab(wc, model.merges)
    pipe = TokenizerDriftPipeline(str(tmp_path / "s"), merges, vocab)
    sch = "doc_id BIGINT, text STRING, source STRING"
    clean = [
        [(10 * e, "the fast table", "web"), (10 * e + 1, "sort runs", "web")]
        for e in range(3)
    ]
    drifted = [
        [(100 + 10 * e, "zzz qqq jjj wxyz", "web")] for e in range(2)
    ]
    for e, rows in enumerate(clean + drifted):
        pipe.write_batch(spark.createDataFrame(rows, sch), epoch_id=e)
    alarms = cusum_changepoints(
        pipe.history(spark),
        ["source"],
        "fertility",
        k=0.05,
        h=0.5,
        baseline_n=3,
    ).collect()
    assert [(r["source"], r["epoch"], r["direction"]) for r in alarms] == [
        ("web", 3, "up")
    ]


DIMS = 8


def _vec(axis: int, i: int, spread: float = 0.05) -> list[float]:
    v = [spread * math.cos(i * 1.7 + d) for d in range(DIMS)]
    v[axis] += 1.0
    return [round(x, 4) for x in v]


def test_cusum_over_embedding_drift_series(spark, tmp_path):
    """Per-list mean residual distance from the embedding monitor's
    store: three in-distribution epochs, then vectors pushed far
    off-axis — every list's series alarms 'up' at the shift epoch."""
    cents = spark.createDataFrame(
        [
            (100 + a, [1.0 if d == a else 0.0 for d in range(DIMS)])
            for a in range(2)
        ],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    pipe = EmbeddingDriftPipeline(str(tmp_path / "s"), cents)
    sch = "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    mix = [0, 0, 1, 1]
    for e in range(3):
        rows = [(100 * e + i, _vec(a, i)) for i, a in enumerate(mix)]
        pipe.write_batch(spark.createDataFrame(rows, sch), epoch_id=e)
    for e in (3, 4):
        far = [
            (
                100 * e + i,
                [
                    0.8 if d == a else (0.6 if d == (a + 1) % 2 else 0.0)
                    for d in range(DIMS)
                ],
            )
            for i, a in enumerate(mix)
        ]
        pipe.write_batch(spark.createDataFrame(far, sch), epoch_id=e)
    alarms = cusum_changepoints(
        pipe.history(spark),
        ["lst"],
        "mean_dist",
        k=0.01,
        h=0.1,
        baseline_n=3,
    ).collect()
    got = sorted((r["lst"], r["epoch"], r["direction"]) for r in alarms)
    assert got == [(100, 3, "up"), (101, 3, "up")]


def test_cusum_over_audit_metric_series(spark, tmp_path):
    """Completeness metric from the quality audit's store: clean
    epochs at 1.0, then a sustained null flood — the check's series
    alarms 'down' at the flood's first epoch."""
    checks = [X.Completeness("id", min_frac=0.9)]
    pipe = AuditPipeline(str(tmp_path / "s"), checks)
    sch = "id BIGINT, cat STRING"
    clean = [[(3 * e + j, "a") for j in range(3)] for e in range(3)]
    flooded = [
        [(None, "a"), (None, "b"), (100 + e, "a")] for e in range(2)
    ]
    for e, rows in enumerate(clean + flooded):
        pipe.write_batch(spark.createDataFrame(rows, sch), epoch_id=e)
    alarms = cusum_changepoints(
        pipe.history(spark),
        ["check_name"],
        "metric",
        k=0.05,
        h=0.3,
        baseline_n=3,
    ).collect()
    assert [
        (r["check_name"], r["epoch"], r["direction"]) for r in alarms
    ] == [("completeness(id)", 3, "down")]
