"""Interleaved A/B for the r13 single-epoch sink reconcile-read skip.

Arm A = stock entries (sink.read skips the reconcile window when the
instance landed one epoch and the caller guarantees per-epoch-PK-unique
rows). Arm B = ParquetUpsertSink.read monkeypatched to ignore the
guarantee (always run the full last-write-wins window) — the pre-r13
read path, on identical replay machinery.

Times the full registered entry (replay + read + noop materialize),
exactly the bench's unit. (The per-batch durationMs machinery-floor
breakdown lives in tools/r12_stream_phases.py.)

Usage: python tools/r13_ab_sink_read.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402
from cassandra_iot_pipeline_spark.streaming import sinks  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = (
    "streaming_hourly_rollup",
    "streaming_raw_passthrough",
    "streaming_conversion_pairs",
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = build_session("r13-ab-sink-read")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    real_read = sinks.ParquetUpsertSink.read

    def full_reconcile_read(self, spark, unique_within_epoch=False):
        return real_read(self, spark)

    results: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        for arm in ("fast", "full"):
            sinks.ParquetUpsertSink.read = (
                real_read if arm == "fast" else full_reconcile_read
            )
            for name in QUERIES:
                spark.sparkContext.setJobDescription(f"{name} [{arm} rep{rep}]")
                t0 = time.perf_counter()
                df = qs[name](spark, SF)
                df.write.format("noop").mode("overwrite").save()
                sec = time.perf_counter() - t0
                results.setdefault((name, arm), []).append(sec)
                print(f"rep{rep} {arm:4s} {name}: {sec:.3f}s", flush=True)
    sinks.ParquetUpsertSink.read = real_read
    print("\n== summary (min / median over reps) ==")
    for name in QUERIES:
        line = f"{name:32s}"
        for arm in ("fast", "full"):
            xs = sorted(results[(name, arm)])
            line += f"  {arm}: min {xs[0]:.3f} med {xs[len(xs) // 2]:.3f}"
        print(line)
    spark.stop()


if __name__ == "__main__":
    main()
