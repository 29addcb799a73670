"""A/B the state-store provider for the bounded streaming replays.
Runs the four registered streaming queries min-of-N in one session.

Usage: python tools/r12_ab_statestore.py rocksdb|hdfs [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"

NAMES = [
    "streaming_hourly_rollup",
    "streaming_raw_passthrough",
    "streaming_sessionize",
    "streaming_conversion_pairs",
]


def main() -> None:
    provider = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    extra = {}
    if provider == "hdfs":
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"
        )
    spark = build_session(f"r12-ss-{provider}", extra_conf=extra)
    print("provider:", spark.conf.get("spark.sql.streaming.stateStore.providerClass"))
    qs = entrymod.queries()
    # warm one pass at sf0.001
    for n in NAMES:
        qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    res = {n: [] for n in NAMES}
    for r in range(reps):
        for n in NAMES:
            t0 = time.perf_counter()
            qs[n](spark, SF).write.format("noop").mode("overwrite").save()
            res[n].append(time.perf_counter() - t0)
    for n in NAMES:
        rs = ", ".join(f"{t:.3f}" for t in res[n])
        print(f"{min(res[n]):7.3f}  {n}  [{rs}]")
    print(f"TOTAL(min) {sum(min(v) for v in res.values()):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
