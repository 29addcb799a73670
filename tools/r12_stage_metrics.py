"""Per-stage metrics for one query via the Spark UI REST API (guide
§1/§7): run the query warm, then dump each stage's executorRunTime,
shuffle read/write, input bytes, task count.

Usage: python tools/r12_stage_metrics.py <query_name> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_session(
        "r12-stages", extra_conf={"spark.ui.enabled": "true"}
    )
    qs = entrymod.queries()
    fn = qs[name]
    for r in range(reps):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        print(f"rep{r}: {time.perf_counter()-t0:.3f}s", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as fh:
        stages = json.load(fh)
    stages.sort(key=lambda s: s["stageId"])
    print(f"{'stage':>5} {'tasks':>5} {'runMs':>8} {'cpuMs':>8} {'shRdMB':>7} "
          f"{'shWrMB':>7} {'inMB':>7} {'rows':>10}  name")
    for s in stages:
        print(
            f"{s['stageId']:>5} {s['numCompleteTasks']:>5} "
            f"{s['executorRunTime']:>8} {s.get('executorCpuTime',0)//1000000:>8} "
            f"{s['shuffleReadBytes']/1e6:>7.2f} {s['shuffleWriteBytes']/1e6:>7.2f} "
            f"{s['inputBytes']/1e6:>7.2f} {s.get('inputRecords',0):>10}  "
            f"{s['name'][:60]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
