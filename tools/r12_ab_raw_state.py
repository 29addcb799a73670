"""A/B state partition width for streaming_raw_passthrough's
dropDuplicatesWithinWatermark state (8 vs session default 32).
Each variant uses a fresh checkpoint (the checkpoint pins the width at
first start). Interleaved reps.

HISTORICAL (r12 pre-change comparison only): since the fix landed,
streaming_raw_passthrough pins its state width to 8 internally via
bounded_replay_confs, so BOTH arms of this tool now measure width 8 —
re-running it reports a false null result. To reproduce the original
measurement, build raw_passthrough_query directly with the session
width set per arm (ADVICE r12).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402
from cassandra_iot_pipeline_spark.streaming import pipeline as P  # noqa: E402

SF = "/root/testdata/sf0.1"


def run(spark, width: int) -> float:
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        t0 = time.perf_counter()
        df = P.streaming_raw_passthrough(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = build_session("r12-ab-rawstate")
    # warm
    for w in (8, 32):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(w))
        P.streaming_raw_passthrough(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    res = {8: [], 32: []}
    for r in range(reps):
        for w in (8, 32):
            res[w].append(run(spark, w))
        print(
            f"rep{r}: w8={res[8][-1]:.3f} w32={res[32][-1]:.3f}", flush=True
        )
    for w in (8, 32):
        rs = res[w]
        print(f"width {w}: min {min(rs):.3f} med {sorted(rs)[len(rs)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
