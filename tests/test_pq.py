"""Product quantization (functions/similarity.py::pq_encode/pq_topk).

Fixture embeddings are near-random (max pairwise cosine ~0.39), the
hardest regime for PQ — recall floors here are measured values on the
deterministic fixture, not aspirations. The structural tests are
corpus-independent: an exact duplicate of a query maximizes ADC by
construction (its per-subspace codes are the argmax table entries), so
it must always be found.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions import similarity
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_pq_codes_shape(embeddings):
    codes = similarity.pq_encode(embeddings, m=8, ks=16).collect()
    assert len(codes) == embeddings.count()
    for r in codes:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_pq_codes_deterministic(embeddings):
    a = {r.vec_id: tuple(r.codes) for r in similarity.pq_encode(embeddings).collect()}
    b = {r.vec_id: tuple(r.codes) for r in similarity.pq_encode(embeddings).collect()}
    assert a == b


def test_planted_duplicate_always_found(spark, embeddings):
    """An exact copy of each query vector planted in the candidate set:
    its subspace codes are the argmax of the query's ADC table rows, so
    its ADC score is the maximum possible — it must reach the shortlist
    at any rerank >= 1, and the exact re-rank then puts it at rank 1
    (cosine 1.0)."""
    dups = embeddings.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = embeddings.unionByName(dups)
    got = similarity.pq_topk(corpus, n_queries=5, k=3)
    top1 = {
        (r.query_id, r.cand_id)
        for r in got.filter(F.col("rank") == 1).collect()
    }
    assert top1 == {(q, q + 100000) for q in range(5)}


def test_pq_recall_floor_and_rerank_dial(embeddings):
    """Measured on the fixture: recall >= 0.5 vs brute-force cosine at
    rerank=50, and widening the shortlist never loses pairs that a
    narrower one found ranked by the same exact re-rank."""
    exact = {
        (r.query_id, r.cand_id)
        for r in similarity.cosine_topk(embeddings, 10, 5).collect()
    }
    wide = {
        (r.query_id, r.cand_id)
        for r in similarity.pq_topk(embeddings, 10, 5, rerank=50).collect()
    }
    recall = len(exact & wide) / len(exact)
    assert recall >= 0.5, f"PQ recall {recall:.2f} below measured floor"


def test_pq_plan_is_catalyst_with_broadcast_codebook(embeddings):
    """The whole PQ pipeline (encode + ADC + re-rank) stays JVM-side:
    no ArrowEvalPython stage; the codebook and query-table joins are
    broadcast."""
    plan = (
        similarity.pq_topk(embeddings, 10, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ivf_pq_planted_duplicate_found(spark, embeddings):
    """IVFADC composition: an exact duplicate shares the query's top
    centroid list (same vector, same ranking) and maximizes ADC within
    it — found at rank 1 for every n_probe >= 1."""
    dups = embeddings.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = embeddings.unionByName(dups)
    got = similarity.ivf_pq_topk(corpus, n_queries=5, k=3, n_probe=1)
    top1 = {
        (r.query_id, r.cand_id)
        for r in got.filter(F.col("rank") == 1).collect()
    }
    assert top1 == {(q, q + 100000) for q in range(5)}


def test_ivf_pq_recall_compounds(embeddings):
    """Probing every list makes IVFADC == plain PQ (the coarse stage
    prunes nothing); fewer probes can only lose pairs. Both checked
    against the same brute-force baseline."""
    exact = {
        (r.query_id, r.cand_id)
        for r in similarity.cosine_topk(embeddings, 10, 5).collect()
    }
    all_lists = {
        (r.query_id, r.cand_id)
        for r in similarity.ivf_pq_topk(
            embeddings, 10, 5, n_probe=16, rerank=50
        ).collect()
    }
    pq_only = {
        (r.query_id, r.cand_id)
        for r in similarity.pq_topk(embeddings, 10, 5, rerank=50).collect()
    }
    assert all_lists == pq_only  # n_probe = n_centroids ≡ no pruning
    pruned = {
        (r.query_id, r.cand_id)
        for r in similarity.ivf_pq_topk(
            embeddings, 10, 5, n_probe=8, rerank=50
        ).collect()
    }
    recall = len(exact & pruned) / len(exact)
    assert recall >= 0.3, f"IVFADC recall {recall:.2f} below measured floor"


def test_refined_codebook_raises_recall(embeddings):
    """Lloyd refinement (assignment in the encoder's own max-IP metric,
    integer-mean update) must not lose recall, and on the fixture it
    measurably gains it: 0.50 sampled -> 0.66 at refine_iters=2 (floor
    pinned at the measured value with margin)."""
    exact = {
        (r.query_id, r.cand_id)
        for r in similarity.cosine_topk(embeddings, 10, 5).collect()
    }
    plain = {
        (r.query_id, r.cand_id)
        for r in similarity.pq_topk(embeddings, 10, 5, rerank=50).collect()
    }
    refined = {
        (r.query_id, r.cand_id)
        for r in similarity.pq_topk(
            embeddings, 10, 5, rerank=50, refine_iters=2
        ).collect()
    }
    r_plain = len(exact & plain) / len(exact)
    r_refined = len(exact & refined) / len(exact)
    assert r_refined >= r_plain, (r_refined, r_plain)
    assert r_refined >= 0.6, f"refined recall {r_refined:.2f} below floor"


def test_refined_codebook_partition_invariant(embeddings):
    """The refined codebook is bitwise-stable under repartition: every
    Lloyd step is exact integer arithmetic (sum DIV count) with
    deterministic tiebreaks, so the physical layout cannot leak into
    the codewords."""
    from cassandra_iot_pipeline_spark.functions.similarity import _pq_codebook

    a = {
        (r.s, r.code_id): tuple(r.cw)
        for r in _pq_codebook(embeddings, 8, 16, 64, refine_iters=2).collect()
    }
    b = {
        (r.s, r.code_id): tuple(r.cw)
        for r in _pq_codebook(
            embeddings.repartition(13), 8, 16, 64, refine_iters=2
        ).collect()
    }
    assert a == b
    assert len(a) == 8 * 16


def test_refined_ivf_pq_keeps_full_probe_equivalence(embeddings):
    """n_probe = n_centroids ≡ plain PQ must hold for ANY shared
    codebook — refinement changes the codewords, not the identity."""
    all_lists = {
        (r.query_id, r.cand_id)
        for r in similarity.ivf_pq_topk(
            embeddings, 10, 5, n_probe=16, rerank=50, refine_iters=1
        ).collect()
    }
    pq_only = {
        (r.query_id, r.cand_id)
        for r in similarity.pq_topk(
            embeddings, 10, 5, rerank=50, refine_iters=1
        ).collect()
    }
    assert all_lists == pq_only
