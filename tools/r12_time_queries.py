"""Time a set of registered queries at sf0.1 with warmup + min-of-N
(bench methodology, isolated). Usage:
python tools/r12_time_queries.py reps name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    spark = build_session("r12-time")
    qs = entrymod.queries()
    for n in names:
        qs[n](spark, WARM).write.format("noop").mode("overwrite").save()
    def pyloop() -> float:
        t0 = time.perf_counter()
        s = 0
        for i in range(10_000_000):
            s += i
        return time.perf_counter() - t0

    results = {n: [] for n in names}
    calibs = []
    for r in range(reps):
        calibs.append(pyloop())
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, SF).write.format("noop").mode("overwrite").save()
            results[n].append(time.perf_counter() - t0)
    print("calib pyloop per rep:", ", ".join(f"{c:.2f}" for c in calibs))
    for n in names:
        rs = ", ".join(f"{t:.3f}" for t in results[n])
        print(f"{min(results[n]):7.3f}  {n}  [{rs}]")
    spark.stop()


if __name__ == "__main__":
    main()
