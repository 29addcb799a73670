"""Lloyd refinement of the IVF coarse centroids
(functions/similarity.py::_coarse_centroids, wired through
AnnIndexStore.build(coarse_refine_iters=N)).

The sha256-minimizer sample puts centroids wherever the corpus is
dense; at real centroid counts that skews the inverted lists and
breaks the n_probe/n_centroids scan-fraction claim. Refinement is
plain Lloyd in the router's own metric (max quantized cosine,
cent_vid tiebreak) with exact integer means — pinned here for
arithmetic exactness, bitwise partition invariance, and store-contract
preservation; the measured list-balance improvement at n_centroids=64
lives in tools/scale_probe.py / SCALE.md."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions.similarity import (
    QUANT,
    _centroid_ranked,
    _coarse_centroids,
)
from tests.conftest import SF_DIR


def _sample_ids(spark, n_rows: int, n_cent: int) -> list[int]:
    """Replicate the init's deterministic sha256-minimizer ordering so
    the test can place clusters around the known seeds."""
    rows = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("vec_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(n_cent)
        .collect()
    )
    return [r["vec_id"] for r in rows]


def _two_cluster_corpus(spark, n_rows: int = 100):
    """Two orthogonal-ish clusters with the two sample seeds forced
    into DIFFERENT clusters, so one Lloyd step's expected assignment is
    exactly the cluster membership."""
    seed_a, seed_b = _sample_ids(spark, n_rows, 2)
    others = [i for i in range(n_rows) if i not in (seed_a, seed_b)]
    half = (n_rows - 2) // 2
    a_set = {seed_a} | set(others[:half])
    rows = []
    for i in range(n_rows):
        noise = 0.01 * (i % 7)
        if i in a_set:
            vec = [1.0, 0.2 + noise, 0.0, 0.0]
        else:
            vec = [0.0, 0.0, 1.0, 0.2 + noise]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    return df, a_set, seed_a, seed_b


def test_refined_centroid_is_exact_integer_mean(spark):
    """One iteration: each centroid lands on the element-wise
    ``sum DIV count`` of its assigned cluster's QUANTIZED vectors,
    re-quantizing bit-exactly from the stored double form."""
    df, a_set, seed_a, seed_b = _two_cluster_corpus(spark)
    cents = _coarse_centroids(df, 2, refine_iters=1)
    got = {
        r["vec_id"]: [round(x * QUANT) for x in r["embedding"]]
        for r in cents.collect()
    }
    data = {r["vec_id"]: r["embedding"] for r in df.collect()}

    def int_mean(ids):
        qs = [[round(x * QUANT) for x in data[i]] for i in ids]
        n = len(qs)
        return [sum(col) // n for col in zip(*qs)]

    b_set = set(data) - a_set
    assert got[seed_a] == int_mean(a_set)
    assert got[seed_b] == int_mean(b_set)
    # and the refined router assigns exactly the clusters
    ranked = _centroid_ranked(df, cents).filter(F.col("crank") == 1)
    assign = {
        r["vec_id"]: r["cent_vid"] for r in ranked.collect()
    }
    assert {i for i, c in assign.items() if c == seed_a} == a_set
    assert {i for i, c in assign.items() if c == seed_b} == b_set


def test_refined_centroids_partition_invariant(spark):
    """Integer means + fixed tiebreaks: the refined centroids are
    bitwise identical under any input partitioning."""
    df, *_ = _two_cluster_corpus(spark)
    one = sorted(
        (r["vec_id"], tuple(r["embedding"]))
        for r in _coarse_centroids(df.repartition(1), 2, 2).collect()
    )
    many = sorted(
        (r["vec_id"], tuple(r["embedding"]))
        for r in _coarse_centroids(df.repartition(13), 2, 2).collect()
    )
    assert one == many


def test_zero_iters_is_the_plain_sample(spark):
    """coarse_refine_iters=0 keeps the r4 behavior (the sampled rows,
    values unchanged up to the double cast) — the registered oracle
    paths stay on this default."""
    emb = load_table(spark, SF_DIR, "embeddings")
    plain = sorted(
        (r["vec_id"], tuple(float(x) for x in r["embedding"]))
        for r in _coarse_centroids(emb, 8, 0).collect()
    )
    sample = sorted(
        (r["vec_id"], tuple(float(x) for x in r["embedding"]))
        for r in emb.select(
            "vec_id",
            "embedding",
            F.sha2(F.col("vec_id").cast("string"), 256).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(8)
        .collect()
    )
    assert plain == sample


def test_ann_store_contracts_hold_with_refined_coarse(spark, tmp_path):
    """A store built with coarse_refine_iters=2: planted exact
    duplicates still share their query's top list and survive to
    rank 1, and add_batch stays bit-parity with a single-shot build
    (the refined centroids are immutable artifacts like the sampled
    ones)."""
    from cassandra_iot_pipeline_spark.functions.ann_store import AnnIndexStore

    emb = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") < 400
    )
    dup = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(dup)
    store = AnnIndexStore(str(tmp_path / "ref"))
    store.build(corpus, n_centroids=8, coarse_refine_iters=2)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = store.topk(queries, k=2, n_probe=2, corpus=corpus).collect()
    # the query itself and its planted copy tie at cosine 1.0 and fill
    # the top-2 — the copy shares the refined routing's top list
    assert {(r["query_id"], r["cand_id"]) for r in got} == {
        (q, c) for q in range(5) for c in (q, q + 100000)
    }

    # any batching of the same vectors against the refined artifacts
    # encodes bit-identically (immutable centroids/codebook)
    split_lo = corpus.filter(F.col("vec_id") < 200)
    split_hi = corpus.filter(F.col("vec_id") >= 200)
    inc = AnnIndexStore(str(tmp_path / "inc"))
    inc.build(split_lo, n_centroids=8, coarse_refine_iters=2)
    inc.add_batch(split_hi.filter(F.col("vec_id") < 300), epoch_id=1)
    inc.add_batch(split_hi.filter(F.col("vec_id") >= 300), epoch_id=2)
    whole = AnnIndexStore(str(tmp_path / "whole"))
    whole.build(split_lo, n_centroids=8, coarse_refine_iters=2)
    whole.add_batch(split_hi, epoch_id=1)
    a = sorted(
        (r["vec_id"], r["lst"], tuple(r["codes"]))
        for r in inc.codes(spark).collect()
    )
    b = sorted(
        (r["vec_id"], r["lst"], tuple(r["codes"]))
        for r in whole.codes(spark).collect()
    )
    assert a == b
