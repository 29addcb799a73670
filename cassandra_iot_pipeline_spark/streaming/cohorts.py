"""Continuously-maintained cohort retention — the streaming form of
``operators/cohorts.py``, completing the family the way the dedup /
ANN / SCD2 / substring pipelines stream their batch operators: each
micro-batch of events lands its distinct (key, period) points as an
epoch delta; the retention matrix is computed ON READ over the folded
point store.

Why this shape: the matrix is a non-monotone aggregate (a user's
cohort can only move EARLIER as late events arrive, shifting whole
rows), so maintaining it incrementally per epoch would re-derive
user-level state anyway. The store is instead the minimal sufficient
statistic — the distinct (k, pi) set, idempotent under replay and
union-order-free — and the matrix aggregation (two exchanges over
per-user period sets, operators/cohorts.py's pinned plan) runs only
when someone asks for it.

Store shape (the shared delta+base lifecycle, store.py):

- ``<dir>/pts/epoch=N/``   the batch's own distinct (k, pi) points
- ``<dir>/pts/base_upto=K/`` at most one compacted base (fold =
  distinct — idempotent and order-free, so compaction provably
  changes nothing any reader can see)

Idempotence: a replayed epoch rewrites identical content (the point
projection is stateless), and distinct-of-union == union-of-distincts
makes the read independent of epoch boundaries — pinned in tests
against one batch ``retention_matrix`` over the concatenated events.

Scale: the per-epoch write is ONE batch-local distinct — the store is
never read in the write path at all (the only pipeline here with
zero store-side work per epoch); compaction bounds the read-side
union at one base + recent deltas, and the distinct fold collapses
the store to one row per (user, period) forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.cohorts import (
    WEEK_SECONDS,
    period_points,
    retention_matrix_from_pts,
)
from ..store import compact_store, read_store


def _pts_schema(
    key: str, updates_schema: str | StructType | None
) -> str:
    if updates_schema is None:
        ktype = "BIGINT"
    else:
        st = (
            updates_schema
            if isinstance(updates_schema, StructType)
            else StructType.fromDDL(updates_schema)
        )
        types = {f.name: f.dataType.simpleString() for f in st.fields}
        if key not in types:
            raise ValueError(
                f"cohorts: key {key!r} absent from events schema "
                f"{sorted(types)}"
            )
        ktype = types[key]
    return f"k {ktype}, pi BIGINT"


class CohortPipeline:
    """foreachBatch-shaped retention maintainer; see module docstring.
    ``write_batch`` per epoch, then :meth:`matrix` for the live
    retention matrix (bit-identical to the batch operator over the
    same events, pinned in tests)."""

    def __init__(
        self,
        base_dir: str,
        key: str = "user_id",
        ts_col: str = "ts",
        period_seconds: int = WEEK_SECONDS,
        compact_every: int | None = None,
        updates_schema: str | StructType | None = None,
    ) -> None:
        self.base_dir = base_dir
        self.key = key
        self.ts_col = ts_col
        self.period_seconds = period_seconds
        self.compact_every = compact_every
        self.pts_dir = f"{base_dir}/pts"
        self.schema = _pts_schema(key, updates_schema)

    # -- reads ----------------------------------------------------------
    def points(self, spark: SparkSession) -> DataFrame:
        """The folded distinct (k, pi) store (empty-safe)."""
        raw = read_store(
            spark, self.pts_dir, spark.createDataFrame([], self.schema)
        )
        return raw.distinct()

    def matrix(self, spark: SparkSession) -> DataFrame:
        """The live retention matrix — the batch operator's pinned
        aggregation over the point store (collect_set dedups, so the
        pre-distinct is free correctness, not a required pass)."""
        return retention_matrix_from_pts(self.points(spark))

    def rolling_active(
        self, spark: SparkSession, window_periods: int = 7
    ) -> DataFrame:
        """Live rolling distinct actives (DAU/WAU/MAU) over the same
        point store — bit-identical to the batch operator over the
        concatenated events (pinned in tests)."""
        from ..operators.cohorts import rolling_active_from_pts

        return rolling_active_from_pts(
            self.points(spark), window_periods, self.period_seconds
        )

    def growth_accounting(self, spark: SparkSession) -> DataFrame:
        """Live growth decomposition (new/retained/resurrected/
        churned) over the same point store — bit-identical to the
        batch operator over the concatenated events (pinned in
        tests)."""
        from ..operators.cohorts import growth_accounting_from_pts

        return growth_accounting_from_pts(self.points(spark))

    # -- write path (foreachBatch) ---------------------------------------
    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pts = period_points(
            batch_df, self.key, self.ts_col, self.period_seconds
        ).distinct()
        # epoch-dir overwrite + stateless projection => replaying an
        # epoch rewrites identical content (idempotent by content, not
        # just by bookkeeping)
        pts.write.mode("overwrite").parquet(
            f"{self.pts_dir}/epoch={epoch_id}"
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
        associative (distinct/union), so reads are unchanged (pinned
        in tests/test_tail_compaction.py for this fold class)."""
        from ..store import compact_epochs

        return compact_epochs(
            spark,
            self.pts_dir,
            spark.createDataFrame([], self.schema),
            fold=lambda df: df.distinct(),
            keep_recent=keep_recent,
        )

    def compact(self, spark: SparkSession) -> int | None:
        """Fold base + deltas with distinct — the reader applies the
        same fold, so compaction is invisible (pinned in tests)."""
        return compact_store(
            spark,
            self.pts_dir,
            spark.createDataFrame([], self.schema),
            fold=lambda df: df.distinct(),
        )

    def foreach_batch(self):
        return self.write_batch


def streaming_cohorts(
    spark: SparkSession,
    staged_events_dir: str,
    events_schema: str,
    base_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = WEEK_SECONDS,
    max_files_per_trigger: int = 1,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Wire a staged event-log directory through the cohort maintainer
    (file order = ingest order, the streaming/dedup.py convention).
    Returns the started StreamingQuery; read the live matrix with
    ``CohortPipeline(base_dir, ...).matrix(spark)``."""
    pipe = CohortPipeline(
        base_dir,
        key,
        ts_col,
        period_seconds,
        compact_every=compact_every,
        updates_schema=events_schema,
    )
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

