"""Continuous data-quality auditing — the streaming form of
``functions/expectations.py``: every micro-batch runs the declared
checks (one aggregation over the batch) and lands its k-row report as
an epoch delta, so the store is a time series of quality metrics —
the drift monitor a production ingest runs next to the pipeline
(think "completeness of user_id by epoch" plotted on the ops
dashboard; a null flood shows up as a metric cliff at its epoch).

Per-epoch semantics, deliberately: each report row describes ONE
micro-batch (batch-local metrics), not the accumulated corpus —
drift detection wants the per-epoch series (a corpus-cumulative
fraction dilutes a sudden null flood by history). For corpus-level
audits run the batch operator over the landed table.

Store shape (the shared delta+base lifecycle, store.py):

- ``<dir>/reports/epoch=N/``      the epoch's own k-row report
- ``<dir>/reports/base_upto=K/``  at most one compacted base (fold =
  identity distinct on (epoch, check) — rows are keyed facts)

Idempotence: the report is a deterministic aggregate of the batch's
content, so replaying an epoch rewrites identical rows.

Scale: the write path is ONE aggregation over the batch (map-side
partials, a 1-row exchange) plus a k-row write; the store grows k
rows per epoch forever — compaction keeps the directory count
bounded; the data volume is negligible by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.expectations import Check, expectations_report
from ..store import compact_epochs, compact_store, read_store

_SCHEMA = (
    "epoch BIGINT, check_name STRING, target STRING, metric DOUBLE,"
    " threshold DOUBLE, passed BOOLEAN"
)


class AuditPipeline:
    """foreachBatch-shaped quality monitor; see module docstring.
    ``write_batch`` per epoch, then :meth:`history` for the metric
    time series or :meth:`failures` for the alert view."""

    def __init__(
        self,
        base_dir: str,
        checks: list[Check],
        compact_every: int | None = None,
    ) -> None:
        if not checks:
            raise ValueError("need at least one check")
        self.base_dir = base_dir
        self.checks = list(checks)
        self.compact_every = compact_every
        self.reports_dir = f"{base_dir}/reports"

    # -- reads ----------------------------------------------------------
    def history(self, spark: SparkSession) -> DataFrame:
        """(epoch, check_name, target, metric, threshold, passed):
        the per-epoch metric series (empty-safe)."""
        return read_store(
            spark,
            self.reports_dir,
            spark.createDataFrame([], _SCHEMA),
        ).distinct()

    def failures(self, spark: SparkSession) -> DataFrame:
        """Epochs/checks that failed (passed false or NULL-metric
        value checks) — the alert feed."""
        return self.history(spark).filter(
            ~F.coalesce(F.col("passed"), F.lit(False))
        )

    # -- write path (foreachBatch) ---------------------------------------
    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = expectations_report(batch_df, self.checks).select(
            F.lit(int(epoch_id)).alias("epoch"),
            "check_name",
            "target",
            "metric",
            "threshold",
            "passed",
        )
        report.write.mode("overwrite").parquet(
            f"{self.reports_dir}/epoch={epoch_id}"
        )
        if (
            self.compact_every is not None
            and (epoch_id + 1) % self.compact_every == 0
        ):
            self.compact(batch_df.sparkSession)

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
            spark.createDataFrame([], _SCHEMA),
            fold=lambda df: df.distinct(),
            keep_recent=keep_recent,
        )

    def compact(self, spark: SparkSession) -> int | None:
        return compact_store(
            spark,
            self.reports_dir,
            spark.createDataFrame([], _SCHEMA),
            fold=lambda df: df.distinct(),
        )

    def foreach_batch(self):
        return self.write_batch


def streaming_audit(
    spark: SparkSession,
    staged_events_dir: str,
    events_schema: str,
    base_dir: str,
    checkpoint_dir: str,
    checks: list[Check],
    max_files_per_trigger: int = 1,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Wire a staged event-log directory through the audit (file order
    = ingest order, the streaming/dedup.py convention). Returns the
    started StreamingQuery; read the series with
    ``AuditPipeline(base_dir, checks).history(spark)``."""
    pipe = AuditPipeline(base_dir, checks, compact_every=compact_every)
    stream = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staged_events_dir)
    )
    return (
        stream.writeStream.foreachBatch(pipe.foreach_batch())
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
