"""A/B spark.sql.streaming.noDataMicroBatches.enabled for the bounded
replays whose final no-data batch provably emits nothing (update-mode
rollup, arrival-time dedup passthrough, inner stream-stream join).
Interleaved reps; also prints row counts + batch counts per mode so the
result-identity claim is checked right here.

Usage: python tools/r12_ab_nodata.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"
CONF = "spark.sql.streaming.noDataMicroBatches.enabled"
NAMES = [
    "streaming_hourly_rollup",
    "streaming_raw_passthrough",
    "streaming_conversion_pairs",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = build_session("r12-ab-nodata")
    qs = entrymod.queries()
    # warm shapes
    for n in NAMES:
        qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    results: dict[tuple[str, str], list[float]] = {}
    counts: dict[tuple[str, str], int] = {}
    for r in range(reps):
        for mode in ("true", "false"):
            spark.conf.set(CONF, mode)
            for n in NAMES:
                t0 = time.perf_counter()
                df = qs[n](spark, SF)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                results.setdefault((n, mode), []).append(dt)
                if r == 0:
                    counts[(n, mode)] = df.count()
        print(f"rep {r} done", flush=True)
    spark.conf.set(CONF, "true")
    for n in NAMES:
        for mode in ("true", "false"):
            rs = results[(n, mode)]
            print(
                f"{n:30s} noData={mode:5s} min {min(rs):.3f} "
                f"med {sorted(rs)[len(rs)//2]:.3f} rows {counts[(n, mode)]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
