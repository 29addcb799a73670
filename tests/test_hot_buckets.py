"""Hot-bucket capping in LSH candidate generation (the boilerplate-skew
guard — functions/dedup.py:_capped_bucket_pairs and the store-probe
sibling in functions/incremental.py:store_candidates).

The failure mode under test: a template shared by k near-identical
documents lands all k in ONE (band, bucket) in EVERY band, so the
uncapped self-join emits ~bands*k^2/2 candidate pairs on single tasks —
the canonical banded-LSH scale killer on web corpora. The cap must

1. leave every fixture-scale result bit-identical (fixture buckets max
   out at 8 docs; the default cap is 256);
2. bound the candidate count to O(k) on a hot corpus, flag the routed
   pairs, and surface the routed buckets in the audit;
3. preserve the thing downstream consumers actually need — duplicate-
   cluster connectivity through the verified hub — so the deduped
   corpus is unchanged vs the uncapped plan;
4. cap the store probe on both directions without shuffling the store.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions import dedup, incremental
from cassandra_iot_pipeline_spark.functions.clusters import resolve_duplicates
from tests.conftest import SF_DIR

TEMPLATE = (
    "breaking news subscribe to our newsletter all rights reserved "
    "terms of service privacy policy copyright footer boilerplate "
)


def _hot_corpus(spark, k: int, n_variants: int = 1):
    """k documents sharing one template; ``n_variants`` tail variants
    keep the corpus from being byte-identical (exact dedup must not
    collapse it first)."""
    rows = [
        (i, TEMPLATE + f"variant {i % n_variants}", "en", "web", len(TEMPLATE))
        for i in range(k)
    ]
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_DIR, "documents").cache()


def test_fixture_results_unchanged_by_cap(spark, documents):
    """Default cap vs uncapped on the driver fixture: identical verified
    pairs (no fixture bucket is hot, so the star path contributes
    nothing and the small path is the r3 plan)."""
    capped = {
        tuple(r)
        for r in dedup.minhash_lsh_pairs(documents, 0.8).collect()
    }
    uncapped = {
        tuple(r)
        for r in dedup.minhash_lsh_pairs(
            documents, 0.8, max_bucket_size=None
        ).collect()
    }
    assert capped == uncapped and len(capped) > 0


def test_hot_corpus_candidates_bounded_and_flagged(spark):
    """600 near-identical docs, cap 100: candidate count is O(k) — the
    star emits at most (k-1) pairs per variant-hub plus cross-variant
    hub links — nowhere near the ~bands*k^2/2 uncapped blowup, every
    candidate is flagged via_hot_bucket, and the audit names the routed
    buckets with their true populations."""
    k = 600
    hot = _hot_corpus(spark, k, n_variants=2)
    banded = dedup.banded_rows(dedup.shingled_docs(hot))
    cands = dedup.candidate_pairs_from_bands(banded, max_bucket_size=100)
    rows = cands.collect()
    assert 0 < len(rows) < 5 * k  # O(k), not O(k^2) (~1.4M uncapped)
    assert all(r["via_hot_bucket"] for r in rows)
    audit = dedup.hot_bucket_audit(banded, max_bucket_size=100).collect()
    assert len(audit) > 0
    assert all(r["population"] > 100 for r in audit)
    # every audited population is one of the variant-cluster sizes
    assert {r["population"] for r in audit} <= {k, k // 2}


def test_capped_dedup_equals_uncapped_dedup(spark):
    """The capped plan must produce the SAME deduplicated corpus as the
    uncapped plan on a hot corpus: star routing loses (non-hub,
    non-hub) pairs but keeps every doc connected to its cluster through
    the verified hub, and resolve_duplicates consumes connectivity, not
    the pair list."""
    hot = _hot_corpus(spark, 300, n_variants=3).cache()
    kept_capped = {
        r["doc_id"]
        for r in resolve_duplicates(
            hot, dedup.minhash_lsh_pairs(hot, 0.8, max_bucket_size=50)
        ).collect()
    }
    kept_uncapped = {
        r["doc_id"]
        for r in resolve_duplicates(
            hot, dedup.minhash_lsh_pairs(hot, 0.8, max_bucket_size=None)
        ).collect()
    }
    assert kept_capped == kept_uncapped == {0}  # one survivor: min doc_id


def test_mixed_corpus_small_buckets_exact(spark, documents):
    """Hot template docs + the fixture corpus: the fixture's own pairs
    must still come out of the exact all-pairs path (via_hot_bucket
    false), untouched by the star routing of the template's buckets."""
    hot = _hot_corpus(spark, 300).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    corpus = documents.unionByName(hot)
    pairs = dedup.minhash_lsh_pairs(corpus, 0.8, max_bucket_size=100)
    fixture_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in pairs.filter(F.col("doc_b") < 1_000_000).collect()
    }
    expected = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(documents, 0.8).collect()
    }
    assert fixture_pairs == expected
    cands = dedup.candidate_pairs_from_bands(
        dedup.banded_rows(dedup.shingled_docs(corpus)), max_bucket_size=100
    )
    flags = {
        r["doc_a"] >= 1_000_000 or r["doc_b"] >= 1_000_000: r["via_hot_bucket"]
        for r in cands.collect()
    }
    # fixture-only candidates unflagged; template candidates flagged
    assert flags.get(False) is False
    assert flags.get(True) is True


def test_store_probe_caps_both_sides_without_store_shuffle(spark):
    """store_candidates with bucket stats: a hot STORE bucket answers
    probes through its min_doc representative only (broadcast filter —
    the store still plans no shuffle join), and a hot BATCH bucket
    probes through its min batch doc only."""
    store_docs = _hot_corpus(spark, 200)
    batch_docs = _hot_corpus(spark, 150).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    band_store = dedup.banded_rows(
        dedup.shingled_docs(store_docs)
    ).localCheckpoint(eager=True)
    stats = incremental.bucket_stats_delta(band_store).localCheckpoint(eager=True)
    batch_bands = dedup.banded_rows(dedup.shingled_docs(batch_docs))
    cand = incremental.store_candidates(
        band_store, batch_bands, max_bucket_size=50, store_bucket_stats=stats
    )
    rows = cand.collect()
    # store side: only the store hub (doc 0) may appear as doc_a;
    # batch side: only the batch hub (doc 10_000) may appear as doc_b
    assert {r["doc_a"] for r in rows} == {0}
    assert {r["doc_b"] for r in rows} == {10_000}
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_incremental_near_dedup_survives_hot_corpus(spark):
    """The registry operator end-to-end on a hot corpus: both the
    fast path and the forced store-replay fallback admit exactly the
    template cluster's first doc per batch-reachability — here doc 0 —
    with bounded candidate generation throughout."""
    hot = _hot_corpus(spark, 400, n_variants=2).cache()
    fast = {
        r["doc_id"]
        for r in incremental.incremental_near_dedup(hot, 0.8).collect()
    }
    replay = {
        r["doc_id"]
        for r in incremental.incremental_near_dedup(
            hot, 0.8, max_driver_pairs=0
        ).collect()
    }
    assert fast == replay == {0}


def test_blocked_tier_threads_bucket_cap(spark):
    """blocked_jaccard_pairs exposes the LSH sub-tier's hot-bucket cap
    (previously hard-coded): with ``max_bucket_size=None`` a routed
    oversized block reproduces the exact tier's pairs bit-for-bit; with
    a tight cap the routed pairs thin to the star sliver but cluster
    connectivity — what dedup consumes — is unchanged."""
    hot = _hot_corpus(spark, 120, n_variants=2).cache()
    exact = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.blocked_jaccard_pairs(
            hot, 0.8, max_block_size=None
        ).collect()
    }
    routed_uncapped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.blocked_jaccard_pairs(
            hot, 0.8, max_block_size=50, max_bucket_size=None
        ).collect()
    }
    assert routed_uncapped == exact and len(exact) > 0
    routed_capped = dedup.blocked_jaccard_pairs(
        hot, 0.8, max_block_size=50, max_bucket_size=10
    )
    capped_pairs = {
        (r["doc_a"], r["doc_b"]) for r in routed_capped.collect()
    }
    assert capped_pairs < {(a, b) for a, b, _ in exact}  # thinned, subset
    kept = {
        r["doc_id"] for r in resolve_duplicates(hot, routed_capped).collect()
    }
    assert kept == {0}  # connectivity through hubs intact


def test_capped_pairs_properties_random_corpora(spark):
    """Property pass over randomized corpora (deterministic seeds):

    - identity: with the cap at or above the max bucket population the
      capped operator equals the uncapped one exactly;
    - coverage: under an aggressive cap, every doc that shares a bucket
      with another doc still appears in at least one candidate pair
      (star routing may thin pairs, never orphan a bucket member);
    - the flag partitions the output: unflagged pairs are exactly the
      uncapped pairs of the small buckets.
    """
    import random

    from pyspark.sql import functions as F

    for seed in (7, 19, 23):
        rng = random.Random(seed)
        vocab = [f"w{i:03d}" for i in range(40)]
        rows = []
        for i in range(rng.randint(40, 80)):
            n = rng.randint(8, 20)
            rows.append(
                (i, " ".join(rng.choice(vocab) for _ in range(n)),
                 "en", "web", n)
            )
        docs = spark.createDataFrame(
            rows,
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
        )
        banded = dedup.banded_rows(dedup.shingled_docs(docs)).localCheckpoint(
            eager=True
        )
        pops = banded.groupBy("band", "bucket").count()
        max_pop = pops.agg(F.max("count")).first()[0]
        capped = {
            tuple(r)
            for r in dedup.candidate_pairs_from_bands(
                banded, max_bucket_size=max_pop
            ).collect()
        }
        uncapped = {
            tuple(r)
            for r in dedup.candidate_pairs_from_bands(
                banded, max_bucket_size=None
            ).collect()
        }
        assert capped == uncapped, seed

        tight = dedup.candidate_pairs_from_bands(banded, max_bucket_size=2)
        tight_rows = tight.collect()
        paired = {r["doc_a"] for r in tight_rows} | {
            r["doc_b"] for r in tight_rows
        }
        multi = {
            r["doc_id"]
            for r in banded.join(
                pops.filter(F.col("count") >= 2), ["band", "bucket"]
            ).collect()
        }
        assert multi <= paired, seed
        unflagged = {
            (r["doc_a"], r["doc_b"])
            for r in tight_rows
            if not r["via_hot_bucket"]
        }
        small_only = {
            tuple(r)
            for r in dedup.candidate_pairs_from_bands(
                banded.join(
                    pops.filter(F.col("count") <= 2).drop("count"),
                    ["band", "bucket"],
                ),
                max_bucket_size=None,
            ).select("doc_a", "doc_b").collect()
        }
        assert unflagged == small_only, seed
