"""Streaming throughput metrics — the engine's version of the
reference consumer's per-batch reporting.

The reference prints ``[Batch N] Wrote X raw events`` from inside its
foreachBatch by calling ``batch_df.count()`` a second time
(spark_consumer.py:139,154) — an extra action per batch that recomputes
the batch just to log its size. The Spark-native replacement is a
``StreamingQueryListener``: the engine already knows every batch's row
count, duration, and rates, and publishes them in the progress event —
observing costs nothing and touches no data.

``ThroughputListener`` collects per-batch rows for every query it sees
(keyed by query id) and summarizes to the counters the reference's
monitor.sh surfaces: total rows, wall time, rows/sec. Register once per
session::

    listener = ThroughputListener()
    spark.streams.addListener(listener)
    ... run queries ...
    listener.summary()          # {query_id: {...totals...}}
    spark.streams.removeListener(listener)
"""

from __future__ import annotations

import threading
from collections import defaultdict

from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Collects (batch_id, input_rows, batch_duration_ms, rows/sec) per
    query from progress events — no actions, no data movement.

    Thread safety: progress events arrive on the listener-bus thread
    while callers poll ``summary()`` from their own — writes and the
    summary snapshot share a lock (without it, a new query's first
    event during a summary() iteration raises 'dictionary changed size
    during iteration')."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.batches: dict[str, list[dict]] = defaultdict(list)

    # the listener runs on the driver's listener bus; exceptions here
    # would kill the bus thread, so record defensively
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "batch_id": p.batchId,
            "input_rows": p.numInputRows,
            "duration_ms": (p.durationMs or {}).get("triggerExecution", 0),
            "rows_per_sec": p.processedRowsPerSecond or 0.0,
        }
        with self._lock:
            self.batches[str(p.id)].append(row)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def summary(self) -> dict[str, dict]:
        """Per-query totals: the counters the reference's monitor.sh
        reads off Cassandra (total rows landed, elapsed, rate)."""
        with self._lock:
            snapshot = {qid: list(b) for qid, b in self.batches.items()}
        out = {}
        for qid, batches in snapshot.items():
            rows = sum(b["input_rows"] for b in batches)
            ms = sum(b["duration_ms"] for b in batches)
            out[qid] = {
                "n_batches": len(batches),
                "total_rows": rows,
                "total_ms": ms,
                "rows_per_sec": rows / (ms / 1000.0) if ms else 0.0,
            }
        return out
