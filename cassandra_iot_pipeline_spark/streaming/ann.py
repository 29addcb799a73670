"""Continuous ANN-index ingestion: the streaming form of
``functions/ann_store.py`` — embedding micro-batches land in the
persisted IVFADC index through ``foreachBatch``, the exact counterpart
of ``streaming/dedup.py``'s curation pipeline for the similarity
surface.

The index's build-once contract carries over: codebook and coarse
centroids are derived ONCE (from a bootstrap corpus, before the stream
starts) and never change — a streaming batch only encodes against them
and appends its codes epoch. That is what keeps every code in the
store comparable and what makes replayed epochs byte-identical
(epoch-dir overwrite, same artifacts). If the corpus drifts far from
the bootstrap sample, rebuild the index offline and swap directories —
the same posture as any serving ANN system (FAISS indexes are not
re-trained in place either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.ann_store import AnnIndexStore

#: embeddings fixture schema for the file-source stand-in (embedding is
#: float32 at rest; the quantizer casts to double itself)
EMBEDDINGS_STREAM_SCHEMA = (
    "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
)


class AnnIngestPipeline:
    """foreachBatch sink landing embedding batches into a PRE-BUILT
    :class:`AnnIndexStore` (raises on an unbuilt index rather than
    silently deriving a codebook from an arbitrary first micro-batch).
    ``compact_every`` folds code deltas into the lst-partitioned base
    on that epoch cadence."""

    def __init__(
        self, index_dir: str, compact_every: int | None = None
    ) -> None:
        self.store = AnnIndexStore(index_dir)
        self.compact_every = compact_every

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        self.store.meta(spark)  # fails loudly if the index was never built
        # store epoch 0 belongs to the bootstrap build; stream epoch e
        # lands as store epoch e+1 (a fixed mapping, so replayed stream
        # epochs stay idempotent). Stage only NEW vectors — re-streaming
        # the bootstrap corpus would store duplicate code rows (harmless
        # for topk, which dedups candidates, but wasted bytes).
        self.store.add_batch(batch_df, epoch_id=epoch_id + 1)
        if (
            self.compact_every is not None
            and (epoch_id + 1) % self.compact_every == 0
        ):
            self.store.compact(spark)

    def foreach_batch(self):
        return self.write_batch


class EmbeddingDedupPipeline:
    """Continuous embedding-level curation: each micro-batch is deduped
    against the persisted ANN index (``AnnIndexStore.near_dup_batch`` —
    exact-cosine-verified, keep-first) before the FULL batch lands in
    the index, producing an append-only curated output — the embedding
    sibling of ``streaming/dedup.py::NearDedupPipeline``.

    Layout: survivors at ``<curated_dir>/epoch=N`` (overwrite —
    idempotent under at-least-once replay: a replayed batch re-probes a
    store already holding its own vectors, and self-collisions are
    removed by the id ordering exactly as in the text pipeline), index
    epochs at stream epoch + 1 (store epoch 0 is the bootstrap build).
    Requires an index built with ``store_vectors=True``."""

    def __init__(
        self,
        index_dir: str,
        curated_dir: str,
        threshold: float = 0.9,
        compact_every: int | None = None,
    ) -> None:
        self.store = AnnIndexStore(index_dir)
        self.curated_dir = curated_dir
        self.threshold = threshold
        self.compact_every = compact_every

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint(eager=True)
        step = self.store.near_dup_batch(batch, self.threshold)
        step.survivors.write.mode("overwrite").parquet(
            f"{self.curated_dir}/epoch={epoch_id}"
        )
        # land ALL batch vectors, duplicates included — transitive
        # suppression across batches needs their codes and vectors
        self.store.add_batch(batch, epoch_id=epoch_id + 1)
        if (
            self.compact_every is not None
            and (epoch_id + 1) % self.compact_every == 0
        ):
            self.store.compact(spark)

    def curated(self, spark: SparkSession) -> DataFrame:
        from .dedup import NearDedupPipeline

        empty = spark.createDataFrame([], EMBEDDINGS_STREAM_SCHEMA)
        return NearDedupPipeline._read_path(spark, self.curated_dir, empty)

    def foreach_batch(self):
        return self.write_batch


def streaming_embedding_dedup(
    spark: SparkSession,
    staged_embeddings_dir: str,
    index_dir: str,
    curated_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    max_files_per_trigger: int = 1,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Wire staged embedding files through the continuous embedding
    dedup. Files must carry ascending vec_id ranges in mtime order
    (the keep-first id contract); the index must be pre-built with
    ``store_vectors=True``."""
    pipe = EmbeddingDedupPipeline(
        index_dir, curated_dir, threshold, compact_every=compact_every
    )
    stream = (
        spark.readStream.schema(EMBEDDINGS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staged_embeddings_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(pipe.foreach_batch())
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()


def streaming_ann_ingest(
    spark: SparkSession,
    staged_embeddings_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Wire a staged embeddings directory into the persisted ANN index.
    Returns the started StreamingQuery; await it, then query with
    ``AnnIndexStore(index_dir).topk(...)``. The index must already be
    built (see module docstring)."""
    pipe = AnnIngestPipeline(index_dir, compact_every=compact_every)
    stream = (
        spark.readStream.schema(EMBEDDINGS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staged_embeddings_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(pipe.foreach_batch())
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()
