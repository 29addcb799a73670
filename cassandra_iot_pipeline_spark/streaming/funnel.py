"""Continuously-maintained funnel — the streaming form of
``operators/funnel.py``, shaped exactly like the cohort maintainer
(streaming/cohorts.py): each micro-batch lands its distinct step
points as an epoch delta; the funnel is computed ON READ over the
folded point store.

Why on-read and not incremental state: the greedy-earliest chain is
NON-MONOTONE under late data — a late step-0 event EARLIER than the
current anchor re-anchors the whole chain (and, with a horizon, can
UN-qualify steps that previously counted). Any per-user incremental
state would have to keep every step event anyway to re-run the fold,
so the store IS the minimal sufficient statistic: the distinct
(k, us, s) step-point set, idempotent under replay and
union-order-free (the fold sorts).

Store shape (the shared delta+base lifecycle, store.py):

- ``<dir>/pts/epoch=N/``     the batch's own distinct step points
- ``<dir>/pts/base_upto=K/`` at most one compacted base (fold =
  distinct — invisible to readers, pinned in tests)

Scale: the per-epoch write is one batch-local filter + distinct — the
store is never read in the write path (zero store-side work per
epoch, the cohort-pipeline property). The store holds only
funnel-TYPED events (the step IN filter), typically a small slice of
the corpus; the read-side funnel is the batch operator's pinned
one-exchange plan over that slice.

READ-SCALING CLASS, stated honestly: :meth:`funnel` folds the FULL
point store — cost grows with corpus lifetime (the point set times
the batch plan), not base+recent-deltas like the sibling stores'
reads. This is inherent, not an implementation gap: the point set is
the proven minimal sufficient statistic for the non-monotone chain,
so any reader must touch all of it. Compaction keeps the constant
small (one distinct-collapsed base); the growth curve is measured in
tools/scale_probe.py ``--funnel-stream`` (read seconds at 1x/3x/10x
store growth, SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..operators.funnel import funnel_from_points, step_points
from ..store import compact_store, read_store


def _pts_schema(key: str, updates_schema: str | StructType | None) -> str:
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
                f"funnel: key {key!r} absent from events schema "
                f"{sorted(types)}"
            )
        ktype = types[key]
    return f"k {ktype}, us BIGINT, s INT"


class FunnelPipeline:
    """foreachBatch-shaped funnel maintainer; see module docstring.
    ``write_batch`` per epoch, then :meth:`funnel` for the live
    drop-off table (bit-identical to the batch operator over the same
    events, pinned in tests)."""

    def __init__(
        self,
        base_dir: str,
        steps: list[str],
        key: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
        horizon_seconds: int | None = None,
        compact_every: int | None = None,
        updates_schema: str | StructType | None = None,
    ) -> None:
        self.base_dir = base_dir
        self.steps = list(steps)
        self.key = key
        self.ts_col = ts_col
        self.type_col = type_col
        self.horizon_seconds = horizon_seconds
        self.compact_every = compact_every
        self.pts_dir = f"{base_dir}/pts"
        self.schema = _pts_schema(key, updates_schema)

    # -- reads ----------------------------------------------------------
    def points(self, spark: SparkSession) -> DataFrame:
        """The folded distinct (k, us, s) store (empty-safe)."""
        raw = read_store(
            spark, self.pts_dir, spark.createDataFrame([], self.schema)
        )
        return raw.distinct()

    def funnel(self, spark: SparkSession) -> DataFrame:
        """The live funnel — the batch aggregation over the point
        store (the fold is duplicate-tolerant, so the pre-distinct is
        free correctness, not a required pass)."""
        return funnel_from_points(
            self.points(spark), self.steps, self.horizon_seconds
        )

    # -- write path (foreachBatch) ---------------------------------------
    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pts = step_points(
            batch_df, self.steps, self.key, self.ts_col, self.type_col
        ).distinct()
        # epoch-dir overwrite + stateless projection => replaying an
        # epoch rewrites identical content
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
        """Fold base + deltas with distinct — same fold as the reader,
        so compaction is invisible (pinned in tests)."""
        return compact_store(
            spark,
            self.pts_dir,
            spark.createDataFrame([], self.schema),
            fold=lambda df: df.distinct(),
        )

    def foreach_batch(self):
        return self.write_batch


def streaming_funnel(
    spark: SparkSession,
    staged_events_dir: str,
    events_schema: str,
    base_dir: str,
    checkpoint_dir: str,
    steps: list[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon_seconds: int | None = None,
    max_files_per_trigger: int = 1,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Wire a staged event-log directory through the funnel maintainer
    (file order = ingest order, the streaming/dedup.py convention).
    Returns the started StreamingQuery; read the live funnel with
    ``FunnelPipeline(base_dir, steps, ...).funnel(spark)``."""
    pipe = FunnelPipeline(
        base_dir,
        steps,
        key,
        ts_col,
        type_col,
        horizon_seconds=horizon_seconds,
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
