"""Stage-level profile of the near-dup family at sf0.1 (guide §1):
time each sub-stage of minhash_lsh_pairs / blocked_jaccard_pairs /
simhash_near_dup through the noop sink, min-of-2, labeled jobs.

Usage: python tools/r12_profile_lsh.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_iot_pipeline_spark.catalog import load_table  # noqa: E402
from cassandra_iot_pipeline_spark.functions import dedup  # noqa: E402
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def timed(spark, name, df_fn, reps=2):
    best = None
    for _ in range(reps):
        df = df_fn()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:7.3f}  {name}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> None:
    spark = build_session("r12-profile")
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    print(f"documents rows: {n}")

    # --- minhash family stages ---
    timed(spark, "docs scan only", lambda: docs.select("doc_id", "text"))
    timed(spark, "canonical", lambda: docs.select(
        "doc_id", dedup.canonical(F.col("text")).alias("canon")))
    timed(spark, "shingle_rows (explode)", lambda: dedup.shingle_rows(docs))
    timed(spark, "shingle_rows + xxhash", lambda: dedup.shingle_rows(docs)
          .select("doc_id", F.xxhash64("s").alias("h")))
    timed(spark, "shingled_docs (collect_set strings)",
          lambda: dedup.shingled_docs(docs))
    timed(spark, "banded_rows(salt) from sets",
          lambda: dedup.banded_rows(dedup.shingled_docs(docs), with_salt=True))
    timed(spark, "candidates (capped, auto)",
          lambda: dedup.minhash_lsh_candidates(docs))
    timed(spark, "minhash_lsh_pairs FULL",
          lambda: dedup.minhash_lsh_pairs(docs, 0.8))

    # --- blocked jaccard stages ---
    toks = docs.select(
        "doc_id", "lang", "source",
        F.array_distinct(dedup.tokens(F.col("text"))).alias("tok"))
    timed(spark, "tokenize+distinct", lambda: toks)
    timed(spark, "blocked_jaccard FULL",
          lambda: dedup.blocked_jaccard_pairs(docs, 0.5))
    timed(spark, "blocked_jaccard exact-only (no routing)",
          lambda: dedup.blocked_jaccard_pairs(docs, 0.5, max_block_size=None))

    # --- simhash stages ---
    timed(spark, "simhash64 fingerprints",
          lambda: dedup.simhash64(docs))
    timed(spark, "simhash FULL",
          lambda: dedup.simhash_near_dup_pairs(docs, 3))
    spark.stop()


if __name__ == "__main__":
    main()
