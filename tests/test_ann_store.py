"""Persisted ANN index (functions/ann_store.py).

Contracts:

1. parity — a store whose artifacts mirror the inline derivation
   answers ivf_pq_topk's exact output (same centroid sample, same
   codebook, same ADC + re-rank arithmetic);
2. incremental ingest — codes encoded against the persisted codebook
   are bit-identical however the corpus is batched, so add_batch
   equals rebuild;
3. compaction — read-identity, and the lst-partitioned base gives the
   probe dynamic partition pruning (only probed lists' files read);
4. the planted-duplicate guarantee survives persistence;
5. the pure-index form (no corpus for re-rank) answers from codes
   alone.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions import similarity
from cassandra_iot_pipeline_spark.functions.ann_store import AnnIndexStore
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def _queries(embeddings, n=10):
    return embeddings.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_store_matches_inline_ivf_pq(spark, embeddings, tmp_path):
    """Artifacts laid down to mirror the inline derivation (centroids +
    codebook sampled from the full corpus, codes over the non-query
    vectors — epoch 0 re-landed with the candidate subset, which the
    overwrite contract makes legal): the persisted index answers
    ivf_pq_topk bit-for-bit."""
    store = AnnIndexStore(str(tmp_path / "idx"))
    store.build(embeddings, n_centroids=16)
    store.add_batch(embeddings.filter(F.col("vec_id") >= 10), epoch_id=0)
    got = sorted(
        map(
            tuple,
            store.topk(
                _queries(embeddings), k=5, n_probe=8, corpus=embeddings
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            similarity.ivf_pq_topk(
                embeddings, n_queries=10, k=5, n_probe=8
            ).collect(),
        )
    )
    assert got == want and len(got) == 50


def test_incremental_add_equals_rebuild(spark, embeddings, tmp_path):
    """Same corpus, different batching: a store built over the first
    half then extended twice carries bit-identical codes (and answers)
    to one that ingested the remainder in a single epoch — the
    immutable-codebook contract."""
    first = embeddings.filter(F.col("vec_id") < 250)
    rest = embeddings.filter(F.col("vec_id") >= 250)
    a = AnnIndexStore(str(tmp_path / "a"))
    a.build(first)
    a.add_batch(rest, epoch_id=1)
    b = AnnIndexStore(str(tmp_path / "b"))
    b.build(first)
    b.add_batch(rest.filter(F.col("vec_id") < 375), epoch_id=1)
    b.add_batch(rest.filter(F.col("vec_id") >= 375), epoch_id=2)
    codes_a = sorted(
        (r["vec_id"], r["lst"], tuple(r["codes"]))
        for r in a.codes(spark).collect()
    )
    codes_b = sorted(
        (r["vec_id"], r["lst"], tuple(r["codes"]))
        for r in b.codes(spark).collect()
    )
    assert codes_a == codes_b and len(codes_a) == embeddings.count()
    qa = sorted(map(tuple, a.topk(_queries(embeddings), corpus=embeddings).collect()))
    qb = sorted(map(tuple, b.topk(_queries(embeddings), corpus=embeddings).collect()))
    assert qa == qb


def test_compaction_identity_and_partition_pruning(spark, embeddings, tmp_path):
    """compact() folds epochs into an lst-partitioned base without
    changing reads, and the probe's code scan is dynamically
    partition-pruned to the probed lists."""
    store = AnnIndexStore(str(tmp_path / "c"))
    store.build(embeddings.filter(F.col("vec_id") < 300))
    store.add_batch(
        embeddings.filter(F.col("vec_id").between(300, 399)), epoch_id=1
    )
    store.add_batch(embeddings.filter(F.col("vec_id") >= 400), epoch_id=2)
    before = sorted(
        (r["vec_id"], r["lst"], tuple(r["codes"]))
        for r in store.codes(spark).collect()
    )
    ans_before = sorted(
        map(tuple, store.topk(_queries(embeddings), corpus=embeddings).collect())
    )
    upto = store.compact(spark)
    assert upto == 2
    base = glob.glob(str(tmp_path / "c" / "codes" / "base_upto=2" / "lst=*"))
    assert len(base) > 1  # laid out as one directory per inverted list
    assert not glob.glob(str(tmp_path / "c" / "codes" / "epoch=*"))
    after = sorted(
        (r["vec_id"], r["lst"], tuple(r["codes"]))
        for r in store.codes(spark).collect()
    )
    assert before == after
    ans_after = sorted(
        map(tuple, store.topk(_queries(embeddings), corpus=embeddings).collect())
    )
    assert ans_before == ans_after
    # the ADC scan joins the lst-partitioned base against a broadcast
    # probe table on lst -> dynamic partition pruning in the scan
    plan = (
        store.topk(_queries(embeddings), n_probe=2, corpus=embeddings)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_planted_duplicate_survives_persistence(spark, embeddings, tmp_path):
    """An exact copy of each query vector, ingested as a later epoch,
    is found at rank 1 (cosine 1.0) through the persisted index."""
    store = AnnIndexStore(str(tmp_path / "d"))
    store.build(embeddings.filter(F.col("vec_id") >= 10))
    dups = embeddings.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    store.add_batch(dups, epoch_id=1)
    corpus = embeddings.unionByName(
        dups.withColumn("label", F.lit("dup")), allowMissingColumns=False
    ) if "label" not in embeddings.columns else embeddings.select(
        "vec_id", "embedding", "label"
    ).unionByName(dups.withColumn("label", F.lit("dup")))
    got = store.topk(
        _queries(embeddings, 5), k=3, n_probe=1, corpus=corpus
    )
    top1 = {
        (r["query_id"], r["cand_id"])
        for r in got.filter(F.col("rank") == 1).collect()
    }
    assert top1 == {(q, q + 100000) for q in range(5)}


def test_pure_index_answers_without_corpus(spark, embeddings, tmp_path):
    """Without a re-rank corpus the index answers from codes alone:
    (query_id, cand_id, adc, rank), k rows per query, ADC-ordered."""
    store = AnnIndexStore(str(tmp_path / "e"))
    store.build(embeddings)
    got = store.topk(_queries(embeddings), k=5, n_probe=8).collect()
    assert {r["query_id"] for r in got} == set(range(10))
    assert all(1 <= r["rank"] <= 5 for r in got)
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["adc"]))
    for rows in per_q.values():
        rows.sort()
        adcs = [a for _, a in rows]
        assert adcs == sorted(adcs, reverse=True)


def test_topk_rerank_query_absent_from_corpus(spark, embeddings, tmp_path):
    """The rerank query side comes from the ``queries`` frame itself
    (it carries the embeddings), so a query_id that is NOT a corpus
    member still gets its k rows — the docstring's standalone-queries
    contract, without unioning queries into the corpus."""
    store = AnnIndexStore(str(tmp_path / "qa"))
    store.build(embeddings)
    probe = embeddings.filter(F.col("vec_id") == 7).select(
        F.lit(999_999).cast("long").alias("query_id"), "embedding"
    )
    got = store.topk(probe, k=5, n_probe=8, corpus=embeddings).collect()
    assert len(got) == 5
    assert all(r["query_id"] == 999_999 for r in got)
    # identical vector 7 is the exact-cosine top hit
    top = min(got, key=lambda r: r["rank"])
    assert top["cand_id"] == 7 and top["cosine"] == pytest.approx(1.0)


def test_rebuild_on_dirty_index_refused(spark, embeddings, tmp_path):
    """build() into a directory already carrying post-build codes
    raises: a new codebook would silently invalidate every stored
    code."""
    store = AnnIndexStore(str(tmp_path / "f"))
    store.build(embeddings.filter(F.col("vec_id") < 100))
    store.add_batch(
        embeddings.filter(F.col("vec_id").between(100, 199)), epoch_id=1
    )
    with pytest.raises(ValueError, match="invalidate previously stored"):
        store.build(embeddings)
    # a compacted store is equally protected
    store.compact(spark)
    with pytest.raises(ValueError, match="invalidate previously stored"):
        store.build(embeddings)


def test_near_dup_batch_drops_planted_dups(spark, embeddings, tmp_path):
    """Ingest-time embedding dedup: exact copies of stored vectors (and
    an intra-batch copy) are dropped with keep-first semantics; novel
    vectors survive. Transitivity across batches: a later copy of a
    DROPPED vector is still caught because the full batch (duplicates
    included) was landed in the index."""
    store = AnnIndexStore(str(tmp_path / "nd"))
    base = embeddings.filter(F.col("vec_id") < 300)
    store.build(base, store_vectors=True)

    def copy_of(src_id, new_id):
        return embeddings.filter(F.col("vec_id") == src_id).select(
            F.lit(new_id).cast("long").alias("vec_id"), "embedding", "label"
        )

    # 1000: novel (copy of 350, which is NOT in the store)
    # 1001: intra-batch duplicate of 1000
    # 1100, 1200: duplicates of stored vectors 5 and 7
    # 1300: novel (copy of 360, not in the store)
    batch1 = (
        copy_of(350, 1000)
        .unionByName(copy_of(350, 1001))
        .unionByName(copy_of(5, 1100))
        .unionByName(copy_of(7, 1200))
        .unionByName(copy_of(360, 1300))
    )
    step = store.near_dup_batch(batch1, threshold=0.999)
    kept = {r["vec_id"] for r in step.survivors.collect()}
    assert kept == {1000, 1300}
    pair_set = {tuple(r) for r in step.pairs.collect()}
    assert (1000, 1001) in pair_set  # keep-first: min id is the survivor
    store.add_batch(batch1, epoch_id=1)  # land ALL, duplicates included

    # batch 2: a copy of DROPPED 1001 — caught via its stored vector
    batch2 = copy_of(350, 2000)
    step2 = store.near_dup_batch(batch2, threshold=0.999)
    assert step2.survivors.count() == 0


def test_near_dup_batch_requires_stored_vectors(spark, embeddings, tmp_path):
    store = AnnIndexStore(str(tmp_path / "nv"))
    store.build(embeddings.filter(F.col("vec_id") < 100))
    with pytest.raises(ValueError, match="store_vectors='int8'"):
        store.near_dup_batch(embeddings.filter(F.col("vec_id") >= 100))
    with pytest.raises(ValueError, match="store_vectors must be"):
        AnnIndexStore(str(tmp_path / "bad")).build(
            embeddings.limit(10), store_vectors="int4"
        )


def test_adc_shortlist_arrow_bit_parity(spark, embeddings, tmp_path):
    """The vectorized (mapInPandas) ADC scan returns exactly the
    catalyst expression path's shortlist — same candidates, same int64
    ADC values, same ranks, same tie resolution — on a query batch
    that includes planted exact duplicates (maximal ties)."""
    store = AnnIndexStore(str(tmp_path / "ap"))
    base = embeddings.filter(F.col("vec_id") < 400)
    store.build(base)
    # queries = 60 corpus members + 5 out-of-corpus exact copies
    queries = base.filter(F.col("vec_id") < 60).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).unionByName(
        base.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 90000).alias("query_id"), "embedding"
        )
    )

    def rows(impl):
        return sorted(
            map(
                tuple,
                store._adc_shortlist(queries, 4, 16, impl=impl).collect(),
            )
        )

    cat, arw = rows("catalyst"), rows("arrow")
    assert cat == arw and len(cat) > 0

    # and with the replay bound applied on both paths
    bound = spark.createDataFrame([(200,)], "bound BIGINT")

    def rows_b(impl):
        return sorted(
            map(
                tuple,
                store._adc_shortlist(
                    queries, 4, 16, cand_bound=bound, impl=impl
                ).collect(),
            )
        )

    cat_b, arw_b = rows_b("catalyst"), rows_b("arrow")
    assert cat_b == arw_b and len(cat_b) > 0
    assert all(r[1] < 200 for r in arw_b)

    # the public topk surface routes through the same tiers identically
    t_cat = sorted(
        map(tuple, store.topk(queries, k=5, n_probe=4).collect())
    )
    t_arw = sorted(
        map(tuple, store.topk(queries, k=5, n_probe=4, impl="arrow").collect())
    )
    assert t_cat == t_arw and len(t_cat) > 0


def test_adc_shortlist_arrow_parity_random(spark, tmp_path):
    """Randomized corpora (deterministic seeds): catalyst/arrow ADC
    parity holds for odd shapes — tiny lists, limit larger than the
    list population, duplicate code rows from a re-landed epoch."""
    import random

    for seed in (3, 11):
        rng = random.Random(seed)
        n = rng.randint(120, 220)
        rows = [
            (i, [round(rng.uniform(-1, 1), 4) for _ in range(64)])
            for i in range(n)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
        )
        store = AnnIndexStore(str(tmp_path / f"rp{seed}"))
        store.build(emb, n_centroids=8)
        # re-land a slice as a NEW epoch -> duplicate code rows, the
        # exact case the code-level dedup exists for
        store.add_batch(emb.filter(F.col("vec_id") < 30), epoch_id=1)
        queries = emb.filter(F.col("vec_id") % 3 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        for limit in (7, 500):  # 500 > corpus: no-cap regime
            cat = sorted(
                map(
                    tuple,
                    store._adc_shortlist(
                        queries, 3, limit, impl="catalyst"
                    ).collect(),
                )
            )
            arw = sorted(
                map(
                    tuple,
                    store._adc_shortlist(
                        queries, 3, limit, impl="arrow"
                    ).collect(),
                )
            )
            assert cat == arw and len(cat) > 0, (seed, limit)


def test_near_dup_batch_int8_mode_matches_full(spark, embeddings, tmp_path):
    """vector_mode='int8' (dims+8 bytes/vector vs 8*dims+8 for 'full'):
    on planted exact dups, perturbed near-dups, and novel vectors the
    int8-verified decision equals the full-precision one — the 8-bit
    cosine error (~1e-3) sits far from any near-dup threshold — while
    the side table stores tinyint arrays, not doubles."""
    boot = embeddings.filter(F.col("vec_id") < 300)
    full = AnnIndexStore(str(tmp_path / "vf"))
    full.build(boot, store_vectors="full")
    int8 = AnnIndexStore(str(tmp_path / "vi"))
    int8.build(boot, store_vectors="int8")
    assert int8.meta(spark)["vector_mode"] == "int8"
    assert int8.meta(spark)["store_vectors"] is True

    def copy_of(src_id, new_id, jitter=0.0):
        emb = F.col("embedding")
        if jitter:
            emb = F.transform(emb, lambda x: x + F.lit(jitter))
        return embeddings.filter(F.col("vec_id") == src_id).select(
            F.lit(new_id).cast("long").alias("vec_id"),
            emb.cast("array<float>").alias("embedding"),
            "label",
        )

    batch = (
        copy_of(5, 1000)  # exact copy of stored 5 -> dropped
        .unionByName(copy_of(7, 1001, jitter=0.003))  # near-dup -> dropped
        .unionByName(copy_of(350, 1002))  # novel (350 not stored)
    )
    step_f = full.near_dup_batch(batch, threshold=0.99)
    step_i = int8.near_dup_batch(batch, threshold=0.99)
    kept_f = {r["vec_id"] for r in step_f.survivors.collect()}
    kept_i = {r["vec_id"] for r in step_i.survivors.collect()}
    assert kept_f == kept_i == {1002}
    pairs_f = {(r["vec_a"], r["vec_b"]) for r in step_f.pairs.collect()}
    pairs_i = {(r["vec_a"], r["vec_b"]) for r in step_i.pairs.collect()}
    assert pairs_i == pairs_f

    # the at-rest form really is 8-bit
    vecs = int8.vectors(spark)
    assert vecs.schema["q8"].dataType.simpleString() == "array<tinyint>"
    sample = vecs.limit(5).collect()
    assert all(
        all(-127 <= v <= 127 for v in r["q8"]) for r in sample
    ) and sample

    # lifecycle parity: compaction folds the int8 table too
    int8.add_batch(batch, epoch_id=1)
    int8.compact(spark)
    assert int8.vectors(spark).count() == boot.count() + 3
