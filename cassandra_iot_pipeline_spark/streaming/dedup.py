"""Streaming ingest deduplication (watermark-bounded state).

The reference pipeline is at-least-once: ``foreachBatch`` may redeliver
a micro-batch after a crash, and idempotence comes entirely from
Cassandra's last-write-wins PK upsert (reference:
iot-cassandra-pipeline/cassandra/init.cql:25,48 — K3 in SURVEY §2.K).
That works only because the sink is an upsert store. A 100 TB curation
pipeline landing append-only parquet/object storage has no LWW to lean
on — re-delivered events become real duplicate rows.

``dedup_stream`` removes duplicates at the source instead:
``dropDuplicatesWithinWatermark`` keeps one state row per key and drops
re-arrivals, and — unlike plain ``dropDuplicates``, whose state grows
without bound for the lifetime of the query — evicts state as the
watermark passes, so steady-state memory is (keys per watermark
window), not (keys ever seen). The delay parameter is the redelivery
horizon: duplicates are guaranteed dropped if they arrive within
``delay`` (event-time) of the first occurrence, which covers the
micro-batch-sized redelivery bursts at-least-once sources produce.

Composes ahead of any downstream query: dedup -> projection -> sink, or
dedup -> watermarked aggregation (the aggregation then never
double-counts a redelivered event).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

DEFAULT_DEDUP_KEYS = ("event_id",)


def dedup_stream(
    stream: DataFrame,
    keys: Sequence[str] = DEFAULT_DEDUP_KEYS,
    ts_col: str = "ts",
    delay: str = "1 minute",
) -> DataFrame:
    """Watermark-bounded exact dedup on ``keys`` for a streaming
    DataFrame. ``delay`` bounds both late-data grace and dedup state
    lifetime (one state row per key, evicted at watermark)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
