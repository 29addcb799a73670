"""Deterministic release of ``localCheckpoint`` block storage.

The engine materializes shared subtrees with ``localCheckpoint
(eager=True)`` (functions/incremental.py documents why). Spark frees
those blocks through the ContextCleaner only when the JVM happens to
GC the RDD reference — correct, but nondeterministic: a long-lived
session replaying many corpora can hold gigabytes of spent checkpoint
blocks between GC cycles. These helpers make the release explicit at
the point an operator KNOWS the blocks are spent (its result no longer
reads them), instead of relying on collection timing.

``release_local_checkpoint`` reaches through the checkpointed
DataFrame's plan (a ``LogicalRDD`` wrapping the materialized RDD) and
unpersists that RDD non-blocking. Best-effort by design: the plan
shape is Spark-internal, so a future Spark that changes it degrades
back to the ContextCleaner path rather than failing the operator —
the blocks are still freed, just lazily (the pre-r5 behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the block-manager storage behind a ``df.localCheckpoint()``
    result. Call ONLY when nothing will read ``df`` (or a frame derived
    from it) again — a later action on it would recompute from an
    empty RDD... except it can't: a LogicalRDD has no lineage, so a
    post-release action fails. Returns True when the blocks were
    released, False when the plan was not a checkpoint frame (wrong
    caller) or the internal API moved (ContextCleaner fallback)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:  # internal-API drift: fall back to ContextCleaner
        return False


def cached_rdd_count(spark: SparkSession) -> int:
    """Number of RDDs currently holding block-manager storage — the
    observability hook the release tests pin on (a session that
    releases deterministically returns to its baseline after every
    operator call instead of growing until GC)."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
