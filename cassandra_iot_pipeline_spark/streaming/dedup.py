"""In-stream dedup for at-least-once sources (W-series extension).

Kafka redelivers records on consumer rebalance, producer retry, and
micro-batch replay after failure. The reference absorbs duplicates only
at the storage layer — Cassandra's PK last-write-wins upsert
(reference: iot-cassandra-pipeline/cassandra/init.cql:25 and
docs/baseline-architecture.md re-delivery note) — which means every
duplicate still pays the full decode, shuffle, and sink write before
the PK collapses it.

Spark's ``dropDuplicatesWithinWatermark`` moves that absorption to the
source side: state holds one entry per key only until the watermark
passes (bounded by ``delay``), and duplicates never reach the sink
shuffle. At 100 TB that is the difference between riding out a replay
storm at the storage layer (amplified writes, compaction pressure) and
dropping it at ingest for the cost of a bounded key-set.

The sink's PK upsert stays on as the second layer — in-stream dedup is
a volume optimization, not the correctness anchor, so the two compose
exactly like the reference's Kafka + Cassandra pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: how long a key is remembered = the maximum redelivery lag absorbed.
#: The bounded replays deliver whole day-files, so duplicates of an
#: event can trail by up to a day-file per trigger misalignment between
#: sources; 2 days covers that with margin. Production tuning: set to
#: the broker's max redelivery window (state size = keys per `delay` of
#: event time — for the reference's ~100 events/s, minutes of delay is
#: a few thousand 8-byte-hashed keys per device fleet).
DEDUP_DELAY = "2 days"


def dedup_within_watermark(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    delay: str = DEDUP_DELAY,
    ts_col: str = "ts",
) -> DataFrame:
    """Drop re-delivered records in-stream with watermark-bounded state.

    Unlike a plain streaming ``dropDuplicates`` (whose state grows
    without bound — every key ever seen), state here is evicted as the
    watermark passes, so the operator runs forever on an unbounded
    stream. Duplicates arriving within ``delay`` of the first copy are
    dropped; later ones fall through to the sink's PK upsert (layer 2).
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def double_delivery(
    spark: SparkSession, staged_dir: str, max_files_per_trigger: int
) -> DataFrame:
    """Deterministic at-least-once worst case: two independent file
    sources over the same staging union into one stream, so every
    record is delivered exactly twice. Both sources list the same files
    in the same order, so the copies co-arrive within a trigger of each
    other — inside ``DEDUP_DELAY`` by construction."""
    from .pipeline import read_event_stream

    first = read_event_stream(spark, staged_dir, max_files_per_trigger)
    second = read_event_stream(spark, staged_dir, max_files_per_trigger)
    return first.unionByName(second)


# --- streaming near-dup dedup (continuous corpus curation) -----------------

#: documents fixture schema for the file-source stand-in (streaming
#: sources require a declared schema, like the event stream's).
DOCUMENTS_STREAM_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


class NearDedupPipeline:
    """Continuous near-dup curation: each micro-batch of documents is
    admitted or dropped against the parquet-persisted MinHash-LSH store
    (functions/incremental.py), producing an append-only curated corpus.

    This is the streaming form of ``incremental_near_dedup`` — the same
    ``near_dedup_batch`` step runs inside ``foreachBatch``, with the
    band + shingle stores living as parquet tables next to the curated
    output:

    - ``<dir>/bands/epoch=N/``     LSH index delta of batch N
    - ``<dir>/shingles/epoch=N/``  verification payload delta of batch N
    - ``<dir>/curated/epoch=N/``   admitted documents of batch N

    **Idempotence** (foreachBatch is at-least-once): every epoch writes
    by *overwriting its own epoch directory*, so a replayed epoch lands
    byte-identical instead of appending twice. A replayed epoch also
    re-probes a store that already contains its own delta — harmless by
    construction: a doc's collision with itself is removed by the
    ``doc_a < doc_b`` filter, and any same-batch pair the first attempt
    caught as an intra pair is caught on replay as a cross pair with
    the same survivor outcome (pinned in tests).

    **Scale**: the per-batch work is the documented near_dedup_batch
    plan — the store scan is shuffle-free (broadcast batch band rows)
    and, because the band store is laid out under ``epoch=N``
    partitions, restarts never rewrite old data. The store scan cost
    grows with the corpus; on a cluster, partition the band store by
    ``band`` as well and the probe prunes to the batch's bands.
    """

    def __init__(self, base_dir: str, threshold: float = 0.8) -> None:
        self.base_dir = base_dir
        self.threshold = threshold
        self.bands_dir = f"{base_dir}/bands"
        self.shingles_dir = f"{base_dir}/shingles"
        self.curated_dir = f"{base_dir}/curated"

    # -- store access -------------------------------------------------
    @staticmethod
    def _read_path(spark: SparkSession, path: str, empty: DataFrame) -> DataFrame:
        """Read a store directory, falling back to ``empty`` only when
        the path does not exist yet. Existence is probed by attempting
        the read (AnalysisException PATH_NOT_FOUND), not os.path — the
        store may live on any Hadoop filesystem (hdfs://, s3a://),
        where a local isdir check would silently report 'no store' and
        re-admit duplicates forever."""
        from pyspark.errors import AnalysisException

        try:
            df = spark.read.parquet(path)
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return empty
            raise
        return df.select(*empty.columns)  # drop the epoch partition col

    def _read_or_empty(self, spark: SparkSession, path: str, which: str):
        from ..functions.incremental import empty_stores

        band_empty, shingle_empty = empty_stores(spark)
        empty = band_empty if which == "bands" else shingle_empty
        return self._read_path(spark, path, empty)

    def curated(self, spark: SparkSession) -> DataFrame:
        """The admitted corpus so far (empty-safe)."""
        empty = spark.createDataFrame([], DOCUMENTS_STREAM_SCHEMA)
        return self._read_path(spark, self.curated_dir, empty)

    # -- write path (called from foreachBatch) ------------------------
    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..functions.incremental import near_dedup_batch

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint(eager=True)
        step = near_dedup_batch(
            batch,
            self._read_or_empty(spark, self.bands_dir, "bands"),
            self._read_or_empty(spark, self.shingles_dir, "shingles"),
            self.threshold,
        )
        # epoch-dir overwrite => replaying an epoch is a no-op rewrite
        step.survivors.write.mode("overwrite").parquet(
            f"{self.curated_dir}/epoch={epoch_id}"
        )
        step.band_delta.write.mode("overwrite").parquet(
            f"{self.bands_dir}/epoch={epoch_id}"
        )
        step.shingle_delta.write.mode("overwrite").parquet(
            f"{self.shingles_dir}/epoch={epoch_id}"
        )

    def foreach_batch(self):
        return self.write_batch


def streaming_near_dedup(
    spark: SparkSession,
    staged_docs_dir: str,
    base_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    max_files_per_trigger: int = 1,
    trigger: dict | None = None,
):
    """Wire a staged document directory through the near-dup pipeline.
    Returns the started StreamingQuery; await it, then read the curated
    corpus with ``NearDedupPipeline(base_dir).curated(spark)``.

    File order is the ingest order (file source lists by modification
    time), so the doc_id-monotonicity contract of near_dedup_batch means
    staged files must carry ascending id ranges — the natural layout for
    an ingest sequence number."""
    pipe = NearDedupPipeline(base_dir, threshold)
    stream = (
        spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staged_docs_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(pipe.foreach_batch())
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()
