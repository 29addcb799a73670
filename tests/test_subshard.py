"""Salted sub-shard routing for hot LSH buckets
(``hot_bucket_mode="subshard"`` — functions/dedup.py).

The star default is right for boilerplate hot buckets (the
overwhelmingly common case), but it links non-hub docs only THROUGH
the hub: in a hot bucket of DIVERSE colliding docs, a true pair of
non-hub docs whose hub links fail verification is lost. Sub-sharding
salts the bucket on a secondary signature (the next band's bucket
hash — a value true near-dups agree on) and all-pairs within each
sub-shard, so such pairs keep their DIRECT candidate.

Contracts pinned here:

1. adversarial corpus (engineered band collision, diverse docs): star
   routing measurably under-recalls the verified pairs; subshard mode
   restores recall 1.0;
2. boilerplate regime: a sub-shard that still exceeds the cap
   (identical salts) falls back to star WITHIN the shard — fan-out
   stays bounded in every regime, and dedup connectivity is unchanged;
3. identity: with the cap at or above every bucket population the
   subshard plan equals the uncapped plan exactly (fixture corpora:
   registered oracle results unchanged);
4. salt semantics: band b's salt IS band (b+1)'s bucket hash.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions import dedup
from cassandra_iot_pipeline_spark.functions.clusters import resolve_duplicates
from tests.conftest import SF_DIR

# 150 true near-dup pairs (2i, 2i+1): a long shared random-letter base
# + a one-word tail difference => shingle J >= ~0.9; different pairs
# draw independent random words, so cross-pair shingle overlap is ~0
# (plain template-word corpora fail this: character shingles of
# "pair0word3" and "pair9word3" overlap heavily).
N_PAIRS = 150


def _pair_corpus(spark):
    import random
    import string

    rows = []
    for i in range(N_PAIRS):
        rng = random.Random(1000 + i)
        base = " ".join(
            "".join(rng.choice(string.ascii_lowercase) for _ in range(8))
            for _ in range(24)
        )
        rows.append((2 * i, base + " tailalpha", "en", "web", 50))
        rows.append((2 * i + 1, base + " tailbeta", "en", "web", 50))
    return spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )


def _collided_bands(spark, salts: dict[int, int]):
    """The engineered collision: every doc in ONE (band, bucket); the
    salt column carries the given per-doc secondary signature (in real
    band rows it is the next band's bucket hash, which true near-dups
    agree on — modeled here directly)."""
    rows = [(d, 0, 42, s) for d, s in salts.items()]
    return spark.createDataFrame(
        rows, "doc_id BIGINT, band INT, bucket BIGINT, salt BIGINT"
    )


def test_star_underrecalls_subshard_restores(spark):
    """The verdict's adversarial case end-to-end: 300 diverse docs
    (150 true pairs) engineered into one hot bucket. Star: only the
    hub's own pair survives verification (recall 1/150). Subshard with
    pair-shared salts: every true pair gets its direct candidate and
    survives (recall 1.0). Fan-out stays bounded either way."""
    docs = _pair_corpus(spark).cache()
    sh = dedup.shingled_docs(docs).localCheckpoint(eager=True)
    # same-pair docs share the salt; cross-pair salts spread
    salts = {d: (d // 2) * 7919 + 13 for d in range(2 * N_PAIRS)}
    banded = _collided_bands(spark, salts)

    true_pairs = {(2 * i, 2 * i + 1) for i in range(N_PAIRS)}

    star_cands = dedup._capped_bucket_pairs(
        banded, ("band", "bucket"), max_bucket_size=30,
        hot_bucket_mode="star",
    )
    star_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.verify_jaccard_pairs(star_cands, sh, sh, 0.8).collect()
    }
    assert star_pairs == {(0, 1)}  # hub 0's own partner only

    sub_cands = dedup._capped_bucket_pairs(
        banded, ("band", "bucket"), max_bucket_size=30,
        hot_bucket_mode="subshard",
    )
    n_sub = sub_cands.count()
    assert n_sub < 2 * N_PAIRS * 30  # bounded: ~cap per doc, not k^2/2
    sub_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.verify_jaccard_pairs(sub_cands, sh, sh, 0.8).collect()
    }
    assert sub_pairs == true_pairs  # recall 1.0
    # every routed pair is flagged for the audit trail
    assert all(r["via_hot_bucket"] for r in sub_cands.collect())


def test_oversized_subshard_falls_back_to_star(spark):
    """Identical salts (the boilerplate regime) put everything in one
    sub-shard; the shard exceeds the cap and star-routes — output is
    the hub star, same as star mode, never a quadratic blowup."""
    salts = {d: 99 for d in range(400)}
    banded = _collided_bands(spark, salts)
    sub = {
        (r["doc_a"], r["doc_b"])
        for r in dedup._capped_bucket_pairs(
            banded, ("band", "bucket"), max_bucket_size=50,
            hot_bucket_mode="subshard",
        ).collect()
    }
    assert sub == {(0, d) for d in range(1, 400)}


def test_auto_default_routes_per_bucket(spark):
    """r5 verdict item #4: the DEFAULT mode decides star vs subshard
    from the data, per bucket. One frame carries BOTH regimes — a
    diverse hot bucket (every true pair keeps its direct candidate:
    recall 1.0, the subshard behavior) and a constant-salt boilerplate
    bucket (single-hub star output, no shard fan) — and each bucket
    gets its own routing under ``hot_bucket_mode="auto"``."""
    docs = _pair_corpus(spark).cache()
    sh = dedup.shingled_docs(docs).localCheckpoint(eager=True)
    diverse = [
        (d, 0, 42, (d // 2) * 7919 + 13) for d in range(2 * N_PAIRS)
    ]
    boiler = [(d, 1, 77, 99) for d in range(400, 800)]
    banded = spark.createDataFrame(
        diverse + boiler, "doc_id BIGINT, band INT, bucket BIGINT, salt BIGINT"
    )
    cands = dedup._capped_bucket_pairs(
        banded, ("band", "bucket"), max_bucket_size=30
    )
    true_pairs = {(2 * i, 2 * i + 1) for i in range(N_PAIRS)}
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.verify_jaccard_pairs(
            cands.filter(F.col("doc_a") < 2 * N_PAIRS), sh, sh, 0.8
        ).collect()
    }
    assert verified == true_pairs  # diverse bucket: recall 1.0
    star_side = {
        (r["doc_a"], r["doc_b"])
        for r in cands.filter(F.col("doc_a") >= 400).collect()
    }
    assert star_side == {(400, d) for d in range(401, 800)}  # star plan
    # the diverse bucket's candidate fan-out stays bounded (~cap/doc)
    assert cands.filter(F.col("doc_a") < 400).count() < 2 * N_PAIRS * 30


def test_auto_without_salt_degrades_to_star(spark):
    """Band rows with no salt column (the persisted stores' shape)
    star-route under auto instead of failing — the pre-r5 semantics."""
    banded = _collided_bands(spark, {d: d for d in range(100)}).drop("salt")
    out = {
        (r["doc_a"], r["doc_b"])
        for r in dedup._capped_bucket_pairs(
            banded, ("band", "bucket"), max_bucket_size=10
        ).collect()
    }
    assert out == {(0, d) for d in range(1, 100)}


def test_subshard_requires_salt_and_valid_mode(spark):
    banded = _collided_bands(spark, {0: 1, 1: 2}).drop("salt")
    with pytest.raises(ValueError, match="salt column"):
        dedup._capped_bucket_pairs(
            banded, ("band", "bucket"), 10, hot_bucket_mode="subshard"
        )
    with pytest.raises(ValueError, match="hot_bucket_mode"):
        dedup._capped_bucket_pairs(
            banded, ("band", "bucket"), 10, hot_bucket_mode="typo"
        )


def test_salt_is_next_bands_bucket(spark):
    """banded_rows(with_salt=True): salt of band b equals the bucket of
    band (b+1) % bands for the same doc, and the default schema is
    untouched without the flag."""
    docs = _pair_corpus(spark).limit(20)
    sh = dedup.shingled_docs(docs)
    plain = dedup.banded_rows(sh)
    assert plain.columns == ["doc_id", "band", "bucket"]
    salted = dedup.banded_rows(sh, with_salt=True)
    n_bands = dedup.LSH_BANDS
    nxt = salted.select(
        "doc_id",
        F.pmod(F.col("band") - 1 + n_bands, F.lit(n_bands)).alias("band"),
        F.col("bucket").alias("next_bucket"),
    )
    joined = salted.join(nxt, ["doc_id", "band"])
    assert joined.filter(F.col("salt") != F.col("next_bucket")).count() == 0
    assert joined.count() == salted.count()


def test_subshard_identity_on_fixture_corpus(spark):
    """No fixture bucket is hot, so subshard mode is plan-reachable but
    value-inert: minhash_lsh_pairs output (the registered oracle
    surface) is identical to the default mode's."""
    documents = load_table(spark, SF_DIR, "documents")
    default = {
        tuple(r) for r in dedup.minhash_lsh_pairs(documents, 0.8).collect()
    }
    sub = {
        tuple(r)
        for r in dedup.minhash_lsh_pairs(
            documents, 0.8, hot_bucket_mode="subshard"
        ).collect()
    }
    assert sub == default and len(sub) > 0


def test_subshard_boilerplate_connectivity_unchanged(spark):
    """On a genuine template corpus (the star's home regime) subshard
    mode dedups to the same survivor set — mode choice is a recall
    knob, never a correctness fork for the deduped corpus."""
    template = (
        "breaking news subscribe to our newsletter all rights reserved "
        "terms of service privacy policy copyright footer boilerplate "
    )
    rows = [
        (i, template + f"variant {i % 2}", "en", "web", len(template))
        for i in range(300)
    ]
    hot = spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).cache()
    kept_star = {
        r["doc_id"]
        for r in resolve_duplicates(
            hot, dedup.minhash_lsh_pairs(hot, 0.8, max_bucket_size=50)
        ).collect()
    }
    kept_sub = {
        r["doc_id"]
        for r in resolve_duplicates(
            hot,
            dedup.minhash_lsh_pairs(
                hot, 0.8, max_bucket_size=50, hot_bucket_mode="subshard"
            ),
        ).collect()
    }
    assert kept_star == kept_sub == {0}


def test_audit_surfaces_routing_decision(spark):
    """r6 ADVICE: hot_bucket_audit reports the auto router's own
    signal per hot bucket — (salt_estimate, n_shards, routed) via the
    identical margin expression — so boundary routing is observable.
    Salt-less frames keep the old (keys, population) schema."""
    diverse = [(d, 0, 42, d * 7919 + 13) for d in range(400)]
    boiler = [(d, 1, 77, 99) for d in range(400, 800)]
    banded = spark.createDataFrame(
        diverse + boiler, "doc_id BIGINT, band INT, bucket BIGINT, salt BIGINT"
    )
    audit = {
        (r["band"], r["bucket"]): r
        for r in dedup.hot_bucket_audit(
            banded, max_bucket_size=30
        ).collect()
    }
    assert set(audit) == {(0, 42), (1, 77)}
    div, boil = audit[(0, 42)], audit[(1, 77)]
    assert div["routed"] == "subshard" and div["n_shards"] == 14
    assert div["salt_estimate"] > div["n_shards"]
    assert boil["routed"] == "star" and boil["salt_estimate"] <= 2
    # salt-less band rows: population-only audit, as before
    bare = dedup.hot_bucket_audit(
        banded.drop("salt"), max_bucket_size=30
    )
    assert set(bare.columns) == {"band", "bucket", "population"}


def test_router_margin_errs_toward_subshard(spark):
    """The (1 - rsd) margin: a bucket whose true distinct-salt count
    sits exactly AT the shard count (where an unlucky HLL estimate
    could land a hair under) routes subshard, not star — recall is
    never lost to sketch noise at the boundary."""
    # pop 120, cap 30 -> n_shards = 4; exactly 4 distinct salts
    rows = [(d, 0, 5, d % 4) for d in range(120)]
    banded = spark.createDataFrame(
        rows, "doc_id BIGINT, band INT, bucket BIGINT, salt BIGINT"
    )
    audit = dedup.hot_bucket_audit(banded, max_bucket_size=30).collect()
    assert len(audit) == 1
    # 4 > 4 is false, but 4 > 4 * 0.95 is true: the margin routes it
    assert audit[0]["routed"] == "subshard"
    # and _capped_bucket_pairs takes the same branch: sharded output
    # (4 shards of 30 = all-pairs within shards), not one 119-pair star
    n = dedup._capped_bucket_pairs(
        banded, ("band", "bucket"), max_bucket_size=30
    ).count()
    assert n == 4 * (30 * 29) // 2
