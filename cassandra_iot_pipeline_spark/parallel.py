"""Scan fan-out for CPU-heavy map stages (optimization guide §2.2/§6).

Motivation (r12, measured at sf0.1): the fixture tables are single-file,
single-row-group parquet, so every scan plans as ONE input split — and
the CPU-heavy work that sits directly on the scan (shingle explosion +
64-permutation MinHash, per-token sha256, Arrow-batched Python codecs)
runs as ONE task while the other cores idle. Stage metrics showed the
minhash shingle/collect stage at ~2.3 s of single-task CPU (twice, both
verification sides) and the whole Avro encode→decode chain at ~0.8 s in
one Python worker.

``spark.sql.files.maxPartitionBytes`` / ``minPartitionNum`` cannot fix
this: parquet splits below a row group produce empty tasks. The fix is
an explicit keyed repartition — but only when the scan is actually
narrow. At 100 TB the corpus arrives as thousands of splits and a
repartition here would shuffle the full input for nothing, so the
helper no-ops whenever the input already carries at least the session's
core parallelism.

The explicit partition count matters: a bare ``repartition(key)`` is
AQE-coalescible (REPARTITION_BY_COL), and AQE's byte-proportional model
folds these small-byte/high-CPU exchanges straight back to one task.
An explicit number (REPARTITION_BY_NUM) is exempt from coalescing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame, *keys: str, target: int | None = None) -> DataFrame:
    """Spread a narrow scan across the session's cores before CPU-heavy
    per-row work. No-op when ``df`` already has >= ``target`` partitions
    (the at-scale case). Keyed (hash) when ``keys`` are given — fully
    deterministic row placement; otherwise round-robin (deterministic
    under retries via Spark's sort-before-repartition, and only used
    where downstream results are partition-order-independent)."""
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    if keys:
        from pyspark.sql import functions as F

        return df.repartition(n, *[F.col(k) for k in keys])
    return df.repartition(n)


def shuffle_width(df: DataFrame) -> int:
    """The session's configured shuffle width — the explicit partition
    count to pin an exchange at when AQE coalescing must not fold a
    small-byte/high-CPU stage to one task (pair expansion, per-pair
    verification). Matches what the implicit exchange would have used
    before coalescing, so pinning it is width-neutral at scale."""
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
