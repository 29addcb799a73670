"""End-to-end corpus curation: the composition a training-data team
actually runs, built purely from the engine's own operators.

    profile -> quality/language filter -> PII redaction
            -> exact dedup -> MinHash-LSH near-dup clusters
            -> cluster resolution
            -> [optional] substring-level boilerplate cut (Lee et al.)
            -> split assignment -> packing layout

Each stage is one of the already-tested primitives (text.text_profile,
cleaning.redact_pii, dedup.exact_dedup/minhash_lsh_pairs,
clusters.resolve_duplicates, sampling.hash_split,
cleaning.pack_concat), so this module adds *composition*, not new
semantics — the value is that the whole chain stays declarative: one
lazily-built DAG per returned frame, no driver-side materialization
between stages, Catalyst free to push the quality filter into the
document scan underneath everything.

100 TB shuffle budget of the full chain (in order): zero for
profile+filter+redact (narrow), one groupBy for exact dedup, the
MinHash banding shuffles (8-byte band keys), the cluster-resolution
label rounds (8-byte keys, paired docs only), zero for split
assignment (hash predicate), one hash-by-shard exchange for packing.
Nothing shuffles full document payloads except the exact-dedup
canonical groupBy — which the docstring of exact_dedup already
prescribes pre-hashing for at scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cleaning import pack_concat, redact_pii
from .clusters import resolve_duplicates
from .dedup import (
    banded_rows,
    canonical,
    hot_bucket_audit,
    minhash_lsh_pairs,
    shingled_docs,
)
from .sampling import hash_split
from .substrings import DEFAULT_K, _spans_from_canon, cut_spans
from .text import repetition_signals, text_profile


@dataclass(frozen=True)
class CurationConfig:
    min_tokens: int = 5
    max_tokens: int = 100_000
    min_alpha_ratio: float = 0.5
    min_quality: float = 0.0
    # percentile quality gate (FineWeb-style "top X% by quality"):
    # applied AFTER the absolute gates, over their survivors — keep
    # the top fraction by quality_score via the exact discrete
    # threshold (sampling.top_fraction_by_score; boundary ties all
    # kept, so the survivor count can slightly exceed the target).
    # None = absolute gates only.
    quality_keep_frac: float | None = None
    allowed_langs: tuple[str, ...] | None = None  # None = keep all
    # Gopher-style repetition gates (None = gate off). A document whose
    # signal is NULL (blank/too short for the n-gram) passes the gate —
    # the token-count band is the rule that owns degenerate docs.
    max_dup_line_frac: float | None = None
    max_top_2gram_frac: float | None = None
    max_dup_5gram_frac: float | None = None
    minhash_threshold: float = 0.8
    # duplicate-cluster survivor policy: False = min doc_id (the base
    # deterministic choice); True = the cluster member with the
    # highest profile quality_score ("train on the best copy"),
    # NULLs last, ties by min doc_id
    survivor_by_quality: bool = False
    # substring-level dedup (Lee et al.) over the dedup SURVIVORS —
    # document-level dedup removes whole near-copies first, then this
    # stage cuts the boilerplate RUNS that survive it (license
    # headers, chrome) out of the remaining texts. When on, the
    # curated/packed text is the CANONICAL form with spans cut (span
    # positions are defined over the canonical text — the paper's
    # operating mode trains on the deduplicated form).
    substring_dedup: bool = False
    substring_k: int = DEFAULT_K
    substring_min_count: int = 2
    substring_hash_shuffle: bool = False
    splits: Mapping[str, float] = field(
        default_factory=lambda: {"train": 0.98, "val": 0.01, "test": 0.01}
    )
    split_seed: int = 0
    block_size: int = 2048
    pack_shards: int = 64


@dataclass(frozen=True)
class CuratedCorpus:
    """Every stage as an inspectable DataFrame. ``curated`` is the
    deliverable; the rest exist for audit queries and row accounting
    (all still lazy — nothing has run until the caller acts)."""

    profile: DataFrame        # doc_id + quality/lang metrics (all docs)
    kept: DataFrame           # docs surviving the quality/lang filter
    redacted: DataFrame       # kept docs, PII replaced, counts attached
    dup_pairs: DataFrame      # near-dup pairs among kept docs
    curated: DataFrame        # one survivor per cluster + split column
    packing: DataFrame        # pack_concat layout of the train split
    hot_buckets: DataFrame    # LSH buckets the near-dup tier star-routed
                              # (band, bucket, population) — "which
                              # boilerplate templates did dedup refuse
                              # to all-pair?"
    substring_stats: DataFrame | None = None
                              # per-survivor removal accounting when
                              # substring_dedup is on: (doc_id,
                              # n_chars_canon, n_spans, chars_removed,
                              # frac_removed) — every survivor gets a
                              # row, zero-filled when untouched

    def report(self) -> dict[str, int]:
        """Row accounting per stage. Four actions — audit tool, not a
        hot path. The counted frames share the expensive upstream
        stages (profile scan, MinHash banding), so they are persisted
        for the duration of the counts: without this each count
        re-executes the whole chain from the source scan (measured 4x
        the chain's own runtime at probe scale)."""
        cached = [self.kept, self.redacted, self.curated]
        for df in cached:
            df.persist()
        try:
            n_total = self.profile.count()
            n_kept = self.kept.count()
            n_curated = self.curated.count()
            n_pii = self.redacted.filter(F.col("n_pii") > 0).count()
        finally:
            for df in cached:
                df.unpersist()
        out = {
            "documents": n_total,
            "kept_after_filter": n_kept,
            "docs_with_pii": n_pii,
            "after_dedup": n_curated,
            "removed_by_filter": n_total - n_kept,
            "removed_as_duplicates": n_kept - n_curated,
            # one thin aggregation over the band rows; nonzero means the
            # near-dup stage capped boilerplate buckets (pairwise recall
            # trade documented at dedup.LSH_MAX_BUCKET) — a curation run
            # report should say so, not bury it
            "hot_lsh_buckets": self.hot_buckets.count(),
        }
        if self.substring_stats is not None:
            # corpus-wide removal accounting (one aggregation): how
            # much boilerplate the substring pass actually cut — the
            # dedup-then-train report row of Lee et al.
            row = self.substring_stats.agg(
                F.count(F.when(F.col("n_spans") > 0, 1)).alias("docs"),
                F.coalesce(F.sum("chars_removed"), F.lit(0)).alias("cut"),
                F.coalesce(F.sum("n_chars_canon"), F.lit(0)).alias("tot"),
            ).first()
            out["substring_docs_with_spans"] = row["docs"]
            out["substring_chars_removed"] = row["cut"]
            out["substring_chars_total"] = row["tot"]
        return out


def curate_corpus(
    documents: DataFrame, config: CurationConfig = CurationConfig()
) -> CuratedCorpus:
    """Run the curation chain; see module docstring for the plan shape.

    Exact duplicates are folded into the near-dup pass by feeding
    canonical-text-identical docs to the cluster resolver as pairs
    (min-doc_id representative per canonical group), so one resolution
    materializes the corpus once instead of scanning it twice.
    """
    profile = text_profile(documents)
    pred = (
        (F.col("n_tokens") >= config.min_tokens)
        & (F.col("n_tokens") <= config.max_tokens)
        & (F.col("alpha_ratio") >= config.min_alpha_ratio)
        & (F.col("quality_score") >= config.min_quality)
    )
    if config.allowed_langs is not None:
        pred = pred & F.col("lang_guess").isin(*config.allowed_langs)
    gated = profile.filter(pred)
    if config.quality_keep_frac is not None:
        # percentile cut over the absolute-gate survivors: the
        # threshold side is a value-collapse aggregation + broadcast
        # (one extra narrow pass over the profile, no corpus shuffle)
        from .sampling import top_fraction_by_score

        # quality_score is a continuous ratio — quantize the
        # threshold to a 1e-6 grid so the cut-line window runs over a
        # bounded domain (the sampling.py docstring's rule), keeping
        # at least the target fraction (floor-grid is one-sided)
        gated = top_fraction_by_score(
            gated, "quality_score", config.quality_keep_frac,
            quantize_decimals=6,
        )
    kept_ids = gated.select("doc_id", "lang_guess")

    rep_gates = (
        ("dup_line_frac", config.max_dup_line_frac),
        ("top_2gram_char_frac", config.max_top_2gram_frac),
        ("dup_5gram_char_frac", config.max_dup_5gram_frac),
    )
    active_gates = [(c, thr) for c, thr in rep_gates if thr is not None]
    if active_gates:
        # one extra doc_id-keyed join; the repetition aggregation itself
        # shuffles only distinct (doc, n, gram) triples (see
        # repetition_signals). Computed lazily only when a gate is on.
        rep = repetition_signals(documents, top_ns=(2,), dup_ns=(5,)).select(
            "doc_id", *[c for c, _ in active_gates]
        )
        rep_pred = F.lit(True)
        for col_name, thr in active_gates:
            rep_pred = rep_pred & (
                (F.col(col_name) <= F.lit(thr)) | F.col(col_name).isNull()
            )
        kept_ids = kept_ids.join(rep.filter(rep_pred), "doc_id").select(
            "doc_id", "lang_guess"
        )
    kept = documents.join(kept_ids, "doc_id")

    redacted = redact_pii(kept)
    # redacted text replaces the original for every downstream stage:
    # dedup must not distinguish two docs that differ only in the PII
    # spans just scrubbed
    redacted_docs = kept.drop("text").join(
        redacted.select("doc_id", "text", "n_pii"), "doc_id"
    )

    # exact-duplicate pairs: (group-min doc_id, other doc_id) per
    # canonical text — same closure semantics as a near-dup pair. The
    # grouping key is xxhash64(canonical): the shuffle carries 8 bytes
    # per row instead of the full document text (the 100 TB posture the
    # exact_dedup docstring prescribes; a 64-bit collision merges two
    # clusters — at web scale that risk is taken by every hash-dedup
    # pipeline, and the oracle-exact text-keyed operator remains
    # available as functions.dedup.exact_dedup)
    canon = redacted_docs.select(
        "doc_id", F.xxhash64(canonical(F.col("text"))).alias("ch")
    )
    canon_min = canon.groupBy("ch").agg(F.min("doc_id").alias("doc_a"))
    exact_pairs = (
        canon.join(canon_min, "ch")
        .filter(F.col("doc_id") != F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
    )
    near_pairs = minhash_lsh_pairs(
        redacted_docs, config.minhash_threshold
    ).select("doc_a", "doc_b")
    dup_pairs = exact_pairs.unionByName(near_pairs)
    hot_buckets = hot_bucket_audit(
        banded_rows(shingled_docs(redacted_docs))
    )

    if config.survivor_by_quality:
        # per-cluster survivor = highest quality_score (NULLs last,
        # ties min doc_id) instead of min doc_id: one extra doc-keyed
        # join to carry the profile's score; the ranking itself runs
        # over the pair-proportional component labeling only
        from .clusters import resolve_duplicates_by_priority

        scored = redacted_docs.join(
            profile.select("doc_id", "quality_score"), "doc_id"
        )
        resolved = resolve_duplicates_by_priority(
            scored, dup_pairs, "quality_score"
        ).drop("quality_score")
    else:
        resolved = resolve_duplicates(redacted_docs, dup_pairs)

    # optional substring-level pass (Lee et al.) over the dedup
    # survivors: duplicated length-k runs are computed ONCE from one
    # shared canonical frame, then (a) cut out of the curated text and
    # (b) aggregated into the removal report. The cut text replaces
    # the survivors' text for split assignment and packing, so the
    # stage folds through the existing downstream lifecycle untouched.
    substring_stats = None
    if config.substring_dedup:
        canon_docs = resolved.select(
            "doc_id", canonical(F.col("text")).alias("canon")
        )
        spans = _spans_from_canon(
            canon_docs,
            config.substring_k,
            config.substring_min_count,
            config.substring_hash_shuffle,
            "auto",
        )
        span_agg = spans.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start")).alias(
                "chars_removed"
            ),
        )
        substring_stats = (
            canon_docs.select(
                "doc_id", F.length("canon").alias("n_chars_canon")
            )
            .join(span_agg, "doc_id", "left")
            .fillna(0, subset=["n_spans", "chars_removed"])
            .withColumn(
                "frac_removed",
                F.when(
                    F.col("n_chars_canon") > 0,
                    F.col("chars_removed") / F.col("n_chars_canon"),
                ).otherwise(F.lit(0.0)),
            )
        )
        resolved = resolved.drop("text").join(
            cut_spans(canon_docs, spans), "doc_id"
        )

    curated = hash_split(
        resolved, "doc_id", dict(config.splits), seed=config.split_seed
    )
    packing = pack_concat(
        curated.filter(F.col("split") == "train"),
        block_size=config.block_size,
        n_shards=config.pack_shards,
    )
    return CuratedCorpus(
        profile=profile,
        kept=kept,
        redacted=redacted,
        dup_pairs=dup_pairs,
        curated=curated,
        packing=packing,
        hot_buckets=hot_buckets,
        substring_stats=substring_stats,
    )
