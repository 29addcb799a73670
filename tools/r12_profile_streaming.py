"""Phase breakdown of the four streaming replay queries at sf0.1
(guide §1): staging, query start -> termination (with per-batch
progress), sink read, for each registered streaming query.

Usage: python tools/r12_profile_streaming.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = build_session("r12-stream-profile")
    from cassandra_iot_pipeline_spark.streaming import joins as sj
    from cassandra_iot_pipeline_spark.streaming import pipeline as sp
    from cassandra_iot_pipeline_spark.streaming.staging import (
        stage_events_stream,
    )

    t0 = time.perf_counter()
    stage_events_stream(spark, SF)
    print(f"staging (cached?): {time.perf_counter()-t0:.3f}s")

    qs = {
        "streaming_hourly_rollup": sp.streaming_hourly_rollup,
        "streaming_raw_passthrough": sp.streaming_raw_passthrough,
        "streaming_sessionize": sp.streaming_sessionize_bounded,
        "streaming_conversion_pairs": sj.streaming_conversion_pairs,
    }
    for name, fn in qs.items():
        for r in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, SF)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"{name} rep{r}: construct+run={t1-t0:.3f}s "
                f"sink_read_materialize={t2-t1:.3f}s total={t2-t0:.3f}s",
                flush=True,
            )
        # one instrumented run: grab the active query progress via a
        # re-run with the internals (hourly only has the wrapper; use
        # the span timings instead)
    spark.stop()


if __name__ == "__main__":
    main()
