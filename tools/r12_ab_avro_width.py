"""A/B the avro_roundtrip_rollup fan-out width (r12 continuation):
the chained encode+decode mapInPandas opens TWO Arrow workers per
task, so a 32-way fan-out holds 64 concurrent Python workers — the
Python-facing fan-out failure mode the round's negative result
documented for embedding_near_dups. Interleaved reps per width.

Usage: python tools/r12_ab_avro_width.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_iot_pipeline_spark import catalog  # noqa: E402
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402
from cassandra_iot_pipeline_spark.sources import avro_wire  # noqa: E402

SF = "/root/testdata/sf0.1"
WIDTHS = [6, 8, 12, 16]


def rollup_at_width(events, width: int):
    src = events if width == 1 else events.repartition(width, F.col("event_id"))
    decoded = avro_wire.decode_sensor_events(
        avro_wire.encode_events_as_frames(src)
    )
    temp_units = F.round(F.col("temperature").cast("double") * 100).cast("long")
    return (
        decoded.groupBy(
            F.col("device_id"), F.expr("timestamp DIV 3600000").alias("hour_idx")
        )
        .agg(F.sum(temp_units).alias("sum_units"), F.count(F.lit(1)).alias("event_count"))
        .select(
            "device_id",
            (F.col("hour_idx") * 3600).alias("hour_bucket"),
            (F.col("sum_units") / F.lit(100.0) / F.col("event_count")).alias("avg_value"),
            "event_count",
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = build_session("r12-ab-avro")
    events = catalog.load_table(spark, SF, "events")
    # warm every width's plan shape once
    for w in WIDTHS:
        rollup_at_width(events, w).write.format("noop").mode("overwrite").save()
    results = {w: [] for w in WIDTHS}
    for r in range(reps):
        t0 = time.perf_counter()
        s = 0
        for i in range(10_000_000):
            s += i
        calib = time.perf_counter() - t0
        line = [f"calib {calib:.2f}"]
        for w in WIDTHS:
            t0 = time.perf_counter()
            rollup_at_width(events, w).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[w].append(dt)
            line.append(f"w{w}={dt:.3f}")
        print("  ".join(line), flush=True)
    for w in WIDTHS:
        rs = results[w]
        print(f"width {w:>2}: min {min(rs):.3f}  med {sorted(rs)[len(rs)//2]:.3f}  max {max(rs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
