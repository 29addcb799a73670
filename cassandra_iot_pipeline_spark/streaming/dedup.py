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
