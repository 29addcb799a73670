"""Continuously-maintained conversion attribution — the streaming form
of ``operators/attribution.py``, shaped exactly like the funnel
maintainer (streaming/funnel.py): each micro-batch lands its distinct
conversion/touch points as an epoch delta; first/last/linear credit is
computed ON READ over the folded point store.

Why on-read (the funnel argument, verbatim): attribution is
NON-MONOTONE under late data — a late touch EARLIER than the current
first touch re-opens the conversion's first-touch credit, and a late
touch anywhere in the window changes every linear share (1/n shifts
for all n touches). Any incremental per-conversion state would have to
keep the window's touch set anyway, so the store IS the minimal
sufficient statistic: the distinct (k, us, type, id) point set,
idempotent under replay and union-order-free.

Store shape (the shared delta+base lifecycle, store.py):

- ``<dir>/pts/epoch=N/``     the batch's own distinct points
  (conversions AND touches, type-tagged)
- ``<dir>/pts/base_upto=K/`` at most one compacted base (fold =
  distinct — bitwise invisible; also tail-foldable via
  ``store.compact_epochs``, the associative class)

Scale: per-epoch write is one batch-local filter + distinct (zero
store-side work); the store holds only attribution-TYPED events. The
read is the batch operator's bucketed-range-join plan over that slice;
like the funnel read, its cost grows with the stored point set (the
minimal-statistic class, stated in streaming/funnel.py) — compaction
keeps the constant small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.attribution import asof_attribution
from ..store import compact_store, read_store


def _pts_schema(
    key: str, tie_col: str, updates_schema: str | StructType | None
) -> str:
    if updates_schema is None:
        ktype, ttype = "BIGINT", "BIGINT"
    else:
        st = (
            updates_schema
            if isinstance(updates_schema, StructType)
            else StructType.fromDDL(updates_schema)
        )
        types = {f.name: f.dataType.simpleString() for f in st.fields}
        missing = [c for c in (key, tie_col) if c not in types]
        if missing:
            raise ValueError(
                f"attribution: columns {missing} absent from events "
                f"schema {sorted(types)}"
            )
        ktype, ttype = types[key], types[tie_col]
    return f"k {ktype}, us BIGINT, t STRING, tie {ttype}"


class AttributionPipeline:
    """foreachBatch-shaped attribution maintainer; see module
    docstring. ``write_batch`` per epoch, then :meth:`report` for the
    live per-channel credit table (bit-identical to the batch operator
    over the same events, pinned in tests)."""

    def __init__(
        self,
        base_dir: str,
        conversion_type: str = "purchase",
        touch_types: Sequence[str] = ("view", "click"),
        lookback_seconds: int = 7 * 86_400,
        key: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
        tie_col: str = "event_id",
        compact_every: int | None = None,
        updates_schema: str | StructType | None = None,
    ) -> None:
        self.base_dir = base_dir
        self.conversion_type = conversion_type
        self.touch_types = list(touch_types)
        self.lookback_seconds = lookback_seconds
        self.key = key
        self.ts_col = ts_col
        self.type_col = type_col
        self.tie_col = tie_col
        self.compact_every = compact_every
        self.pts_dir = f"{base_dir}/pts"
        self.schema = _pts_schema(key, tie_col, updates_schema)

    # -- reads ----------------------------------------------------------
    def points(self, spark: SparkSession) -> DataFrame:
        """The folded distinct point store (empty-safe)."""
        raw = read_store(
            spark, self.pts_dir, spark.createDataFrame([], self.schema)
        )
        return raw.distinct()

    def report(self, spark: SparkSession) -> DataFrame:
        """The live attribution table — the pair-free batch operator
        (``asof_attribution``, bit-equal to the pair path, pinned in
        the batch tests) over the point store: the store accumulates a
        LIFETIME of points, exactly the regime where the pair path's
        conversions x touches cost explodes and the as-of sort stays
        flat. Duplicate points collapse in the pre-distinct; the
        operator counts rows, so the distinct is REQUIRED correctness
        here, unlike the funnel's duplicate-tolerant fold — which is
        why write_batch also distincts."""
        pts = self.points(spark).select(
            F.col("k").alias(self.key),
            F.timestamp_micros(F.col("us")).alias(self.ts_col),
            F.col("t").alias(self.type_col),
            F.col("tie").alias(self.tie_col),
        )
        return asof_attribution(
            pts,
            self.conversion_type,
            self.touch_types,
            self.lookback_seconds,
            self.key,
            self.ts_col,
            self.type_col,
            self.tie_col,
        )

    # -- write path (foreachBatch) ---------------------------------------
    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        wanted = [self.conversion_type, *self.touch_types]
        pts = (
            batch_df.filter(F.col(self.type_col).isin(wanted))
            .select(
                F.col(self.key).alias("k"),
                F.unix_micros(F.col(self.ts_col)).alias("us"),
                F.col(self.type_col).alias("t"),
                F.col(self.tie_col).alias("tie"),
            )
            .distinct()
        )
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
        return compact_store(
            spark,
            self.pts_dir,
            spark.createDataFrame([], self.schema),
            fold=lambda df: df.distinct(),
        )

    def foreach_batch(self):
        return self.write_batch


def streaming_attribution(
    spark: SparkSession,
    staged_events_dir: str,
    events_schema: str,
    base_dir: str,
    checkpoint_dir: str,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 7 * 86_400,
    max_files_per_trigger: int = 1,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Wire a staged event-log directory through the attribution
    maintainer (file order = ingest order, the streaming/dedup.py
    convention). Returns the started StreamingQuery; read the live
    credit table with ``AttributionPipeline(base_dir, ...).report``."""
    pipe = AttributionPipeline(
        base_dir,
        conversion_type,
        touch_types,
        lookback_seconds,
        compact_every=compact_every,
        updates_schema=events_schema,
    )
    reader = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staged_events_dir)
    )
    writer = reader.writeStream.foreachBatch(pipe.foreach_batch()).option(
        "checkpointLocation", checkpoint_dir
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()
