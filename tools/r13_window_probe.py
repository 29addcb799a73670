"""Cheap host-window probe: one fixed-work 4-batch stateful streaming
job (the bench's calib_state_commit shape, halved) + one 2M-row parquet
write. Prints two numbers; used to pick a quiet window for full bench
runs on this co-tenant-noisy VM. Data-independent."""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    spark = build_session("r13-window-probe")
    base = tempfile.mkdtemp(prefix="r13_probe_")
    # untimed warmup: the first actions in a session pay JVM class
    # loading + codegen (~5 s) — without this the probe measures
    # session startup, not the host window.
    spark.range(1_000_000).select(F.sum("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(100_000).select("id").write.mode("overwrite").parquet(
        f"{base}/warm"
    )
    t0 = time.perf_counter()
    spark.range(2_000_000).select(
        "id", (F.col("id") % 997).alias("k")
    ).write.mode("overwrite").parquet(f"{base}/pq")
    w = time.perf_counter() - t0

    spark.range(100_000).select("id", (F.col("id") % 5000).alias("k")).repartition(
        4
    ).write.parquet(f"{base}/src")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        t0 = time.perf_counter()
        q = (
            spark.readStream.schema("id BIGINT, k BIGINT")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/src")
            .groupBy("k")
            .count()
            .writeStream.foreachBatch(
                lambda df, eid: df.write.format("noop").mode("overwrite").save()
            )
            .outputMode("update")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        s = time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    shutil.rmtree(base, ignore_errors=True)
    print(f"probe: parquet_write_2m={w:.3f}s state_commit_4batch={s:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
