"""Continuous tokenizer-drift monitoring — the streaming form of
``functions/bpe.py::tokenizer_report``: each micro-batch of documents
is scored against a FROZEN tokenizer (the merges learned at training
time) and lands its per-group fertility / OOV report as an epoch
delta, making tokenizer fit a queryable time series.

Why a corpus owner wants this: a tokenizer is trained once and then
serves an ever-growing ingest. New sources drift — different
vocabulary raises fertility (more pieces per word = more compute per
document), new scripts raise the OOV-word rate (characters outside
the training alphabet degrade to unk ids). Both belong on the same
ops dashboard as the quality audit (streaming/audit.py — this module
is its tokenizer sibling, same store discipline).

Per-epoch semantics, deliberately: each row describes ONE batch —
drift wants the series, not a history-diluted cumulative (the audit
module's argument verbatim).

Store shape (store.py lifecycle):

- ``<dir>/reports/epoch=N/``      the epoch's per-group report rows
- ``<dir>/reports/base_upto=K/``  at most one compacted base
  (fold = distinct — rows are keyed facts (epoch, group))

Idempotence: the report is a deterministic aggregate of the batch, so
a replayed epoch rewrites identical rows. Scale: the write path is
the batch operator's own plan (distinct-word confinement — Python
touches the batch's vocab, never token occurrences) plus a
groups-sized write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bpe import tokenizer_report
from ..store import compact_epochs, compact_store, read_store


class TokenizerDriftPipeline:
    """foreachBatch-shaped tokenizer monitor; see module docstring.
    ``write_batch`` per epoch, then :meth:`history` for the series or
    :meth:`drift` for epochs whose fertility / OOV worsened beyond a
    threshold relative to the first epoch's baseline."""

    def __init__(
        self,
        base_dir: str,
        merges: list[tuple[str, str]],
        vocab: DataFrame,
        group_cols: Sequence[str] = ("source",),
        text_col: str = "text",
        compact_every: int | None = None,
    ) -> None:
        self.base_dir = base_dir
        self.merges = list(merges)
        # the vocab is part of the frozen tokenizer: materialize it
        # driver-side once (it is |alphabet| + n_merges rows) so every
        # epoch broadcasts identical content
        self._vocab_rows = vocab.select("token", "id").collect()
        self._vocab_schema = "token STRING, id BIGINT"
        self.group_cols = list(group_cols)
        self.text_col = text_col
        self.compact_every = compact_every
        self.reports_dir = f"{base_dir}/reports"
        gcols = ", ".join(f"{g} STRING" for g in self.group_cols)
        self.schema = (
            f"epoch BIGINT, {gcols}, n_words BIGINT, n_pieces BIGINT,"
            " fertility DOUBLE, oov_word_rate DOUBLE"
        )

    def _vocab(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self._vocab_rows, self._vocab_schema)

    # -- reads ----------------------------------------------------------
    def history(self, spark: SparkSession) -> DataFrame:
        """(epoch, group..., n_words, n_pieces, fertility,
        oov_word_rate): the per-epoch series (empty-safe)."""
        return read_store(
            spark,
            self.reports_dir,
            spark.createDataFrame([], self.schema),
        ).distinct()

    def drift(
        self,
        spark: SparkSession,
        fertility_slack: float = 0.1,
        oov_slack: float = 0.01,
    ) -> DataFrame:
        """Epoch/group rows whose fertility exceeds the group's FIRST
        epoch by more than ``fertility_slack`` (relative) or whose OOV
        rate exceeds it by more than ``oov_slack`` (absolute) — the
        alert view. Baseline = earliest epoch per group (min_by)."""
        from pyspark.sql import Window

        h = self.history(spark)
        w = Window.partitionBy(*self.group_cols)
        base_f = F.min_by("fertility", "epoch").over(w)
        base_o = F.min_by("oov_word_rate", "epoch").over(w)
        return (
            h.withColumn("baseline_fertility", base_f)
            .withColumn("baseline_oov", base_o)
            .filter(
                (
                    F.col("fertility")
                    > F.col("baseline_fertility") * (1 + fertility_slack)
                )
                | (F.col("oov_word_rate") > F.col("baseline_oov") + oov_slack)
            )
        )

    # -- write path (foreachBatch) ---------------------------------------
    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        report = tokenizer_report(
            batch_df,
            self.merges,
            self._vocab(spark),
            self.group_cols,
            self.text_col,
        ).select(F.lit(int(epoch_id)).alias("epoch"), "*")
        report.write.mode("overwrite").parquet(
            f"{self.reports_dir}/epoch={epoch_id}"
        )
        if (
            self.compact_every is not None
            and (epoch_id + 1) % self.compact_every == 0
        ):
            self.compact(spark)

    # -- maintenance ------------------------------------------------------
    def compact_tail(
        self, spark: SparkSession, keep_recent: int = 0
    ) -> int | None:
        """Tail compaction (store.compact_epochs): fold only the delta
        tail, base byte-untouched — O(tail) maintenance; the fold is
        associative, so reads are unchanged (the compact_epochs
        contract; family-pinned in tests/test_tail_compaction.py)."""
        return compact_epochs(
            spark,
            self.reports_dir,
            spark.createDataFrame([], self.schema),
            fold=lambda df: df.distinct(),
            keep_recent=keep_recent,
        )

    def compact(self, spark: SparkSession) -> int | None:
        return compact_store(
            spark,
            self.reports_dir,
            spark.createDataFrame([], self.schema),
            fold=lambda df: df.distinct(),
        )

    def foreach_batch(self):
        return self.write_batch


def streaming_tokenizer_drift(
    spark: SparkSession,
    staged_docs_dir: str,
    docs_schema: str,
    base_dir: str,
    checkpoint_dir: str,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    group_cols: Sequence[str] = ("source",),
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Wire a staged document directory through the drift monitor
    (file order = ingest order, the streaming/dedup.py convention).
    Returns the started StreamingQuery; read the series with
    ``TokenizerDriftPipeline(...).history(spark)``."""
    pipe = TokenizerDriftPipeline(
        base_dir,
        merges,
        vocab,
        group_cols,
        text_col,
        compact_every=compact_every,
    )
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staged_docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(pipe.foreach_batch())
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
