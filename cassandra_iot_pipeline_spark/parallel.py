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

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size conf string ("134217728", "128MB", "4m")."""
    s = v.strip().lower().rstrip("b")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def _estimated_scan_splits(df: DataFrame, files: list[str]) -> int:
    """Estimate how many input splits the file scan plans, from file
    metadata alone — Spark's own sizing formula
    (``FilePartition.maxSplitBytes``: split files at
    min(maxPartitionBytes, max(openCostInBytes, totalBytes/minPartitionNum)),
    then greedy-pack), evaluated driver-side without touching
    ``df.rdd`` (r12's probe — which forced a full analysis + physical
    planning pass AND built a Python RDD chain per call, ~45-60 ms warm
    / >1 s cold, on the hot path of 8+ queries)."""
    spark = df.sparkSession
    conf = spark.conf
    max_part = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4m"))
    min_num = conf.get("spark.sql.files.minPartitionNum", None) or conf.get(
        "spark.sql.leafNodeDefaultParallelism", None
    )
    min_part_num = int(min_num) if min_num else spark.sparkContext.defaultParallelism

    def _size(uri: str) -> int:
        p = urlparse(uri)
        if p.scheme in ("", "file"):
            try:
                return os.path.getsize(unquote(p.path))
            except OSError:
                return 0
        # remote filesystem: one metadata call per file (only reached
        # when the file count alone could not decide, i.e. < target)
        jvm = spark._jvm  # type: ignore[attr-defined]
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[attr-defined]
        return int(fs.getFileStatus(path).getLen())

    total = sum(_size(f) + open_cost for f in files)
    bytes_per_core = total // max(min_part_num, 1)
    max_split = min(max_part, max(open_cost, bytes_per_core))
    return max(1, -(-total // max(max_split, 1)))


def fan_out_scan(df: DataFrame, *keys: str, target: int | None = None) -> DataFrame:
    """Spread a narrow scan across the session's cores before CPU-heavy
    per-row work. No-op when ``df`` already scans >= ``target`` splits
    (the at-scale case). Keyed (hash) when ``keys`` are given — fully
    deterministic row placement; otherwise round-robin (deterministic
    under retries via Spark's sort-before-repartition, and only used
    where downstream results are partition-order-independent).

    The width probe is file-source metadata only (``df.inputFiles()`` +
    size stats, ~8 ms) — never a planning pass; non-file sources fall
    back to the RDD probe."""
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    files = df.inputFiles()
    if len(files) >= n:
        return df
    if files:
        width = _estimated_scan_splits(df, files)
    else:  # non-file source (memory, RDD-backed): the exact probe
        width = df.rdd.getNumPartitions()
    if width >= n:
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
