"""A/B: current string shingle sets vs xxhash64-hashed shingle sets for
the minhash LSH pipeline, interleaved reps in one session (guide §1).

The hashed variant must produce IDENTICAL results: buckets derive from
(xxhash64(s) & 0xFFFFFFFF), which equals (h & 0xFFFFFFFF) when sh
stores h = xxhash64(s); the verify Jaccard over distinct 64-bit hashes
equals the string-set Jaccard w.h.p. (same argument as hashed_tokens).

Usage: python tools/r12_ab_hashed_shingles.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from cassandra_iot_pipeline_spark.catalog import load_table  # noqa: E402
from cassandra_iot_pipeline_spark.functions import dedup  # noqa: E402
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def shingled_docs_hashed(documents: DataFrame) -> DataFrame:
    """(doc_id, sh): distinct xxhash64 shingle-hash set per document."""
    return (
        dedup.shingle_rows(documents)
        .select("doc_id", F.xxhash64("s").alias("hs"))
        .groupBy("doc_id")
        .agg(F.collect_set("hs").alias("sh"))
    )


def banded_rows_hashed(sh_df, n_hashes=64, bands=8, with_salt=True):
    a_const, b_const = dedup._perm_constants(n_hashes)
    rows_per_band = n_hashes // bands
    exploded = sh_df.select("doc_id", F.explode("sh").alias("hs")).select(
        "doc_id", F.col("hs").bitwiseAND(F.lit(0xFFFFFFFF)).alias("h")
    )
    sig = exploded.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(
                    F.col("h") * F.lit(a_const[i]) + F.lit(b_const[i]),
                    F.lit(dedup.MERSENNE_P),
                )
            ).alias(f"m{i}")
            for i in range(n_hashes)
        ]
    )

    def bucket_of(b: int) -> Column:
        return F.xxhash64(
            *[F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        )

    def band_struct(b: int) -> Column:
        fields = [F.lit(b).alias("band"), bucket_of(b).alias("bucket")]
        if with_salt:
            fields.append(bucket_of((b + 1) % bands).alias("salt"))
        return F.struct(*fields)

    out_cols = [
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    ]
    if with_salt:
        out_cols.append(F.col("bb.salt").alias("salt"))
    return sig.select(
        "doc_id",
        F.explode(F.array(*[band_struct(b) for b in range(bands)])).alias("bb"),
    ).select(*out_cols)


def minhash_pairs_hashed(documents, threshold=0.8):
    sh_df = shingled_docs_hashed(documents)
    candidates = dedup.candidate_pairs_from_bands(
        banded_rows_hashed(sh_df, with_salt=True)
    )
    return dedup.verify_jaccard_pairs(candidates, sh_df, sh_df, threshold)


def timed(spark, name, df_fn):
    df = df_fn()
    spark.sparkContext.setJobDescription(name)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return dt


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = build_session("r12-ab-hashed")
    docs = load_table(spark, SF, "documents")

    # correctness first: identical pair sets + jaccard values
    cur = dedup.minhash_lsh_pairs(docs, 0.8).orderBy("doc_a", "doc_b")
    new = minhash_pairs_hashed(docs, 0.8).orderBy("doc_a", "doc_b")
    a = [(r.doc_a, r.doc_b, r.jaccard) for r in cur.collect()]
    b = [(r.doc_a, r.doc_b, r.jaccard) for r in new.collect()]
    print(f"rows: cur={len(a)} new={len(b)} identical={a == b}", flush=True)
    assert a == b, "MISMATCH"

    ta, tb = [], []
    for r in range(reps):
        ta.append(timed(spark, f"cur rep{r}",
                        lambda: dedup.minhash_lsh_pairs(docs, 0.8)))
        tb.append(timed(spark, f"new rep{r}",
                        lambda: minhash_pairs_hashed(docs, 0.8)))
        print(f"rep{r}: cur={ta[-1]:.3f} hashed={tb[-1]:.3f}", flush=True)
    print(f"MIN cur={min(ta):.3f} hashed={min(tb):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
