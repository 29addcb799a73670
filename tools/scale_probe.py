"""Scale probe: run the flagship operators on generated data far beyond
the fixtures and report throughput. Evidence for the 100 TB design
claims — every input is produced by the partition-invariant hash
generator (no driver-side data), so the same harness runs at any size.

Usage: python tools/scale_probe.py [n_events_millions] [n_devices]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cassandra_iot_pipeline_spark.operators.agg import hourly_rollup  # noqa: E402
from cassandra_iot_pipeline_spark.operators.serving import (  # noqa: E402
    latest_n_per_device,
)
from cassandra_iot_pipeline_spark.operators.skew import (  # noqa: E402
    salted_hourly_rollup,
)
from cassandra_iot_pipeline_spark.operators.upsert import latest_by_pk  # noqa: E402
from cassandra_iot_pipeline_spark.functions.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    simhash_near_dup_pairs,
)
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402


def probe_events(spark, n_events: int, n_devices: int, start: int = 0):
    """Synthetic events shaped like the fixture table, hash-derived.
    ``start`` shifts the id range so successive calls produce disjoint
    event populations (the probe_documents convention)."""
    df = spark.range(start, start + n_events)
    return df.select(
        F.col("id").alias("event_id"),
        F.timestamp_millis(
            F.lit(1704067200000) + F.pmod(F.xxhash64(F.lit("t"), F.col("id")), F.lit(30 * 86400)) * 1000
        ).alias("ts"),
        F.pmod(F.xxhash64(F.lit("u"), F.col("id")), F.lit(n_devices)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "view", "purchase", "signup", "error")]),
            (F.pmod(F.xxhash64(F.lit("e"), F.col("id")), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.round(F.pmod(F.xxhash64(F.lit("v"), F.col("id")), F.lit(20000)) / 100, 2)).alias("value"),
    )


def probe_documents(spark, n_docs: int, vocab_size: int = 2000, start: int = 0):
    """Synthetic documents: 40-120 hash-chosen words from a shared
    vocabulary (mimics the fixture corpus shape at any size). Text is a
    pure function of the range id, so ``start`` shifts which documents
    exist — two calls overlap exactly on their shared id range."""
    vocab = F.array(
        *[F.format_string("word%04d", F.lit(i)) for i in range(vocab_size)]
    )
    n_words = (F.pmod(F.xxhash64(F.lit("n"), F.col("id")), F.lit(80)) + 40).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.col("id"), i), F.lit(vocab_size)) + 1).cast("int"),
        ),
    )
    return spark.range(start, start + n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
        F.lit("syn").alias("lang"),
        F.lit("probe").alias("source"),
        F.lit(0).alias("n_chars"),
    )


def timed(label, df, results):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    results[label] = round(time.perf_counter() - t0, 2)
    # incremental progress on stderr so a long probe is observable
    print(f"[probe] {label}: {results[label]}s", file=sys.stderr, flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_events = int(float(args[0]) * 1_000_000) if args else 20_000_000
    n_devices = int(args[1]) if len(args) > 1 else 10_000
    spark = build_session("scale-probe")
    events = probe_events(spark, n_events, n_devices)

    results: dict[str, float] = {}
    # Warm-up: run the flagship plan on a 2M-row slice, untimed.
    # Measured on this runtime: the first query of a session pays
    # ~3-4x its steady-state time in codegen/JIT (100M rollup: 285s
    # cold vs 69s warm, identical plan) — without this the probe's
    # first row is a JIT benchmark, not an operator benchmark.
    t0 = time.perf_counter()
    hourly_rollup(probe_events(spark, 2_000_000, n_devices)).write.format(
        "noop"
    ).mode("overwrite").save()
    results["warmup_sec"] = round(time.perf_counter() - t0, 2)
    # --only: skip the always-on headline sections and run just the
    # requested flag sections (saves ~20 min per targeted probe run)
    if "--only" not in sys.argv:
        timed("hourly_rollup", hourly_rollup(events), results)
        timed("salted_hourly_rollup", salted_hourly_rollup(events), results)
        timed("latest_n_per_device", latest_n_per_device(events, 3), results)
        timed(
            "upsert_dedup",
            latest_by_pk(events, ("user_id", "event_type"), "ts", ("event_id",)),
            results,
        )

        n_docs = max(20_000, n_events // 1000)
        docs = probe_documents(spark, n_docs)
        timed("minhash_lsh_pairs", minhash_lsh_pairs(docs, 0.8), results)
        timed("simhash_near_dup", simhash_near_dup_pairs(docs, 3), results)
        results["n_docs"] = n_docs

        # incremental near-dup: one online step landing a half-corpus batch
        # against a store of the other half — the steady-state shape
        # (store >> batch happens at larger corpus/batch ratios; the store
        # side is a shuffle-free broadcast probe either way)
        from cassandra_iot_pipeline_spark.functions.dedup import (
            banded_rows,
            shingled_docs,
        )
        from cassandra_iot_pipeline_spark.functions.incremental import (
            near_dedup_batch,
        )

        half = n_docs // 2
        store_docs = probe_documents(spark, half)
        batch_docs = probe_documents(spark, n_docs - half, start=half)
        store_sh = shingled_docs(store_docs).localCheckpoint(eager=True)
        store_bands = banded_rows(store_sh).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        step = near_dedup_batch(
            batch_docs, store_bands, store_sh.select("doc_id", "sh"), 0.8
        )
        step.survivors.write.format("noop").mode("overwrite").save()
        results["near_dedup_batch_half_corpus"] = round(time.perf_counter() - t0, 2)
        print(
            f"[probe] near_dedup_batch_half_corpus: "
            f"{results['near_dedup_batch_half_corpus']}s",
            file=sys.stderr, flush=True,
        )

        # corpus-cleaning ops at the same document scale: redaction is a
        # narrow scan; contamination broadcasts a ~1% "benchmark" slice's
        # shingle hashes; packing windows per shard
        from cassandra_iot_pipeline_spark.functions.cleaning import (
            contamination_overlap,
            pack_concat,
            redact_pii,
        )

        timed("redact_pii", redact_pii(docs), results)

        from cassandra_iot_pipeline_spark.functions.text import (
            repetition_signals,
            tfidf_top_terms,
        )

        timed("repetition_signals", repetition_signals(docs), results)
        timed("tfidf_top_terms", tfidf_top_terms(docs, 5), results)
        bench = docs.filter(F.col("doc_id") % 101 == 0)
        timed(
            "contamination_overlap", contamination_overlap(docs, bench), results
        )
        timed("pack_concat", pack_concat(docs, 2048, 64), results)

        # Bloom incremental dedup: corpus = this doc set's canonical keys,
        # batch = a half-overlapping shifted copy — the landing-batch shape.
        # Timed end to end: sketch probe + exact verify of the positives.
        from cassandra_iot_pipeline_spark.functions.bloom import (
            build_bloom_sketch,
            incremental_dedup,
            sketch_words_for_keys,
        )

        corpus_keys = docs.select(F.col("text").alias("canon")).distinct()
        # genuinely half-overlapping: ids [n/2, 3n/2) share [n/2, n) with
        # the corpus and bring n/2 new texts (text is a function of the id,
        # so shifting doc_id alone would produce a 100%-duplicate batch and
        # time only the worst-case all-positive path)
        batch = probe_documents(spark, n_docs, start=n_docs // 2).select(
            "doc_id", F.col("text").alias("canon")
        )
        n_words = sketch_words_for_keys(n_docs)
        sketch = build_bloom_sketch(corpus_keys, "canon", n_words)
        timed(
            "bloom_incremental_dedup",
            incremental_dedup(batch, corpus_keys, sketch, "canon", n_words),
            results,
        )

        # LM perplexity: train the bigram model on the corpus and score it
        # (train + score together — the per-batch steady state reuses a
        # persisted model and only pays the score half)
        from cassandra_iot_pipeline_spark.functions.lm import (
            bigram_model,
            lm_perplexity,
        )

        t0 = time.perf_counter()
        bigrams, contexts, vocab = bigram_model(docs)
        lm_perplexity(docs, bigrams, contexts, vocab).write.format("noop").mode(
            "overwrite"
        ).save()
        results["lm_train_and_score"] = round(time.perf_counter() - t0, 2)

        # the full curation chain end-to-end (filter -> redact -> dedup ->
        # resolve -> split); timed around the materialization of the final
        # curated frame, which pulls the whole DAG
        from cassandra_iot_pipeline_spark.functions.curation import (
            CurationConfig,
            curate_corpus,
        )

        # synthetic "wordNNNN" tokens are half digits, so the default
        # alpha-ratio floor would empty the corpus at stage 1 and the probe
        # would time nothing; relax it so every stage sees real volume
        cfg = CurationConfig(min_alpha_ratio=0.2)
        t0 = time.perf_counter()
        curated = curate_corpus(docs, cfg).curated
        curated.write.format("noop").mode("overwrite").save()
        results["curate_corpus"] = round(time.perf_counter() - t0, 2)

        # duplicate-cluster resolution: chain-shaped clusters of 4 docs
        # (diameter 3 — worse than the near-clique graphs real dedup
        # emits), one edge row per id. Timed around the whole call since
        # label propagation iterates internally.
        from cassandra_iot_pipeline_spark.functions.clusters import (
            connected_components,
        )

        n_edges = max(1_000_000, n_events // 20)
        chain_len = 4
        idx = spark.range(n_edges)
        cluster = F.col("id") / (chain_len - 1)
        pos = F.pmod(F.col("id"), F.lit(chain_len - 1))
        pairs = idx.select(
            (F.floor(cluster) * chain_len + pos).cast("long").alias("doc_a"),
            (F.floor(cluster) * chain_len + pos + 1).cast("long").alias("doc_b"),
        )
        t0 = time.perf_counter()
        connected_components(pairs).write.format("noop").mode("overwrite").save()
        results["connected_components"] = round(time.perf_counter() - t0, 2)
        results["cc_edges"] = n_edges
        # Count-Min sketch: build over every token occurrence of the corpus
        # (~80 words/doc), then estimate the full vocabulary — the
        # heavy-hitter monitoring shape. Sketch size is fixed (depth x width
        # counters) regardless of corpus size.
        from cassandra_iot_pipeline_spark.functions.sketches import (
            cm_estimate,
            cm_sketch,
        )

        token_rows = docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("t")
        )
        t0 = time.perf_counter()
        sk = cm_sketch(token_rows)
        cm_estimate(token_rows, sk).write.format("noop").mode("overwrite").save()
        results["cm_sketch_and_estimate"] = round(time.perf_counter() - t0, 2)
        print(
            f"[probe] cm_sketch_and_estimate: {results['cm_sketch_and_estimate']}s",
            file=sys.stderr, flush=True,
        )

        # Z-ordered at-rest layout: the one probe that must hit real disk
        # (the cost IS the range-shuffle + parquet write). 10% of the event
        # volume keeps the probe's disk footprint bounded while still
        # measuring the shuffle+sort+write pipeline at scale.
        import shutil
        import tempfile

        from cassandra_iot_pipeline_spark.storage import write_zordered

        zdir = tempfile.mkdtemp(prefix="scale_probe_zorder_")
        # quantize user_id into the 16-bit grid (the guard rejects raw ids
        # >= 2^16 — exactly what it exists for); pmod keeps the layout's
        # locality structure for a hash-distributed id
        z_events = probe_events(spark, n_events // 10, n_devices).withColumn(
            "hour", F.hour("ts")
        ).withColumn("user_q", F.pmod(F.col("user_id"), F.lit(1 << 16)))
        try:
            t0 = time.perf_counter()
            write_zordered(z_events, zdir, col_a="user_q", col_b="hour", bits=16)
            results["write_zordered_10pct"] = round(time.perf_counter() - t0, 2)
            print(
                f"[probe] write_zordered_10pct: {results['write_zordered_10pct']}s",
                file=sys.stderr, flush=True,
            )
        finally:
            shutil.rmtree(zdir, ignore_errors=True)

        # Hot-bucket skew: ONE boilerplate template x 10k near-identical
        # docs — every doc lands in the same bucket in every band, the
        # corpus shape that kills uncapped banded LSH (~bands*k^2/2
        # candidates on single tasks). The capped operator star-routes it;
        # candidate count recorded to show the O(k) bound. The uncapped
        # contrast runs at 1/8 the size (its cost is quadratic — the point).
        from cassandra_iot_pipeline_spark.functions.dedup import (
            banded_rows as _banded,
            candidate_pairs_from_bands,
            shingled_docs as _shingled,
        )

        template = F.lit(
            "all rights reserved terms of service privacy policy cookie "
            "notice subscribe to our newsletter copyright footer boilerplate "
        )
        n_hot = 10_000
        hot_docs = spark.range(n_hot).select(
            F.col("id").alias("doc_id"),
            F.concat(template, F.lit("variant "), (F.col("id") % 7).cast("string")).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("web").alias("source"),
            F.lit(0).alias("n_chars"),
        )
        t0 = time.perf_counter()
        n_cand = candidate_pairs_from_bands(
            _banded(_shingled(hot_docs))
        ).count()
        results["hot_bucket_capped_10k_template"] = round(time.perf_counter() - t0, 2)
        results["hot_bucket_capped_candidates"] = n_cand
        hot_small = hot_docs.filter(F.col("doc_id") < n_hot // 8)
        t0 = time.perf_counter()
        n_unc = candidate_pairs_from_bands(
            _banded(_shingled(hot_small)), max_bucket_size=None
        ).count()
        results["hot_bucket_uncapped_1250_template"] = round(
            time.perf_counter() - t0, 2
        )
        results["hot_bucket_uncapped_candidates"] = n_unc
        print(
            f"[probe] hot_bucket capped 10k: "
            f"{results['hot_bucket_capped_10k_template']}s / {n_cand} candidates; "
            f"uncapped 1250: {results['hot_bucket_uncapped_1250_template']}s / "
            f"{n_unc} candidates",
            file=sys.stderr, flush=True,
        )

        # IVFADC (ivf_pq_topk) over hash-derived embeddings: the PQ code
        # scan moves 8-byte codes, the coarse stage prunes to n_probe/16 of
        # the corpus, the exact re-rank touches only the shortlist sliver.
        from cassandra_iot_pipeline_spark.functions.similarity import ivf_pq_topk

        n_vecs = 100_000
        emb = spark.range(n_vecs).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: (
                    F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) - 1000
                ).cast("double")
                / 1000.0,
            ).alias("embedding"),
            F.lit("probe").alias("label"),
        )
        t0 = time.perf_counter()
        ivf_pq_topk(emb, n_queries=10, k=5, n_probe=4).write.format("noop").mode(
            "overwrite"
        ).save()
        results["ivf_pq_topk_100k"] = round(time.perf_counter() - t0, 2)
        results["ivf_pq_n_vecs"] = n_vecs
        print(
            f"[probe] ivf_pq_topk_100k: {results['ivf_pq_topk_100k']}s",
            file=sys.stderr, flush=True,
        )

        # Streaming near-dup store mechanics at scale: 10 epochs of 5k docs
        # through the parquet-backed pipeline (real store reads/writes,
        # bucket stats, watermark guard) with a mid-replay compaction.
        # First vs last epoch timing shows per-batch cost tracking the
        # batch, not the accumulated corpus (the store side is a broadcast
        # probe of the batch's band rows).
        import shutil as _shutil
        import tempfile as _tempfile

        from cassandra_iot_pipeline_spark.streaming.dedup import NearDedupPipeline

        store_dir = _tempfile.mkdtemp(prefix="scale_probe_neardedup_")
        pipe = NearDedupPipeline(store_dir, threshold=0.8, compact_every=5)
        per_epoch = 5_000
        epoch_times = []
        try:
            for e in range(10):
                b = probe_documents(spark, per_epoch, start=e * per_epoch)
                t0 = time.perf_counter()
                pipe.write_batch(b, epoch_id=e)
                epoch_times.append(round(time.perf_counter() - t0, 2))
            results["near_dedup_pipeline_epoch_first"] = epoch_times[0]
            results["near_dedup_pipeline_epoch_last"] = epoch_times[-1]
            results["near_dedup_pipeline_total_50k"] = round(sum(epoch_times), 2)
        finally:
            _shutil.rmtree(store_dir, ignore_errors=True)
        print(
            f"[probe] near_dedup_pipeline 10x5k epochs: {epoch_times}",
            file=sys.stderr, flush=True,
        )

        # Persisted ANN index lifecycle at the same 100k-vector scale:
        # build (centroids + codebook + epoch-0 codes), one incremental
        # 10k-vector add, compaction into lst=-partitioned inverted lists,
        # then a 10-query probe answered from the partition-pruned store.
        from cassandra_iot_pipeline_spark.functions.ann_store import AnnIndexStore

        ann_dir = _tempfile.mkdtemp(prefix="scale_probe_ann_")
        try:
            idx = AnnIndexStore(ann_dir)
            t0 = time.perf_counter()
            idx.build(emb)
            results["ann_store_build_100k"] = round(time.perf_counter() - t0, 2)
            delta = spark.range(n_vecs, n_vecs + 10_000).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda d: (
                        F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) - 1000
                    ).cast("double")
                    / 1000.0,
                ).alias("embedding"),
            )
            t0 = time.perf_counter()
            idx.add_batch(delta, epoch_id=1)
            results["ann_store_add_10k"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            idx.compact(spark)
            results["ann_store_compact"] = round(time.perf_counter() - t0, 2)
            queries = emb.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            t0 = time.perf_counter()
            idx.topk(queries, k=5, n_probe=4).write.format("noop").mode(
                "overwrite"
            ).save()
            results["ann_store_query_10"] = round(time.perf_counter() - t0, 2)
        finally:
            _shutil.rmtree(ann_dir, ignore_errors=True)
        print(
            f"[probe] ann_store build/add/compact/query: "
            f"{results['ann_store_build_100k']}/{results['ann_store_add_10k']}/"
            f"{results['ann_store_compact']}/{results['ann_store_query_10']}s",
            file=sys.stderr, flush=True,
        )

        # Streaming embedding dedup at the same index scale (r4 verdict #8:
        # the one operator family with no SCALE row): bootstrap a 100k
        # int8-verified index, then 10 epochs of 2k-vector batches through
        # the full write path (watermark guard, ADC probe with the
        # replayed-copy bound, exact-verified drop, curated write, index
        # landing, compaction cadence). Flat per-epoch times = per-batch
        # cost tracks the batch, not the accumulated index.
        from cassandra_iot_pipeline_spark.streaming.ann import (
            EmbeddingDedupPipeline,
        )

        def probe_embeddings(lo: int, hi: int):
            return spark.range(lo, hi).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda d: (
                        F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) - 1000
                    ).cast("float")
                    / 1000.0,
                ).alias("embedding"),
                F.lit(0).alias("label"),
            )

        edd_dir = _tempfile.mkdtemp(prefix="scale_probe_edd_")
        try:
            # untimed warm-up on a throwaway mini index: the first
            # write_batch of a session pays the whole path's codegen/JIT
            # (measured 186 s first epoch vs ~50 s steady before this),
            # same artifact the event-probe warm-up removes
            widx = AnnIndexStore(f"{edd_dir}/warm_idx")
            widx.build(probe_embeddings(0, 3_000), store_vectors="int8")
            EmbeddingDedupPipeline(
                f"{edd_dir}/warm_idx", f"{edd_dir}/warm_curated", threshold=0.95
            ).write_batch(probe_embeddings(3_000, 3_500), epoch_id=0)

            eidx = AnnIndexStore(f"{edd_dir}/idx")
            eidx.build(probe_embeddings(0, n_vecs), store_vectors="int8")
            epipe = EmbeddingDedupPipeline(
                f"{edd_dir}/idx", f"{edd_dir}/curated", threshold=0.95,
                compact_every=5,
            )
            e_times = []
            per_epoch_vecs = 2_000
            for e in range(10):
                b = probe_embeddings(
                    n_vecs + e * per_epoch_vecs, n_vecs + (e + 1) * per_epoch_vecs
                )
                t0 = time.perf_counter()
                epipe.write_batch(b, epoch_id=e)
                e_times.append(round(time.perf_counter() - t0, 2))
            results["embedding_dedup_epoch_first"] = e_times[0]
            results["embedding_dedup_epoch_last"] = e_times[-1]
            results["embedding_dedup_total_20k_vs_100k_index"] = round(
                sum(e_times), 2
            )
        finally:
            _shutil.rmtree(edd_dir, ignore_errors=True)
        print(
            f"[probe] embedding_dedup 10x2k epochs vs 100k index: {e_times}",
            file=sys.stderr, flush=True,
        )

        # Coarse-centroid Lloyd refinement at n_centroids=64 (r4 verdict
        # #5) on a smooth (hash-uniform) corpus: there the list imbalance
        # comes entirely from where the sample happened to land, which is
        # exactly what Lloyd corrects (centroidal layout). On corpora of
        # ATOMIC semantic clusters the floor is the cluster granularity
        # itself — k-means optimizes distortion, not balance, and ties
        # route a whole cluster to one list (measured separately while
        # tuning this probe: 256 atomic clusters / 64 centroids stays at
        # max/mean ~2.1 with or without refinement, recall 1.0) — so the
        # smooth number is the honest measure of the quantizer, and the
        # clustered caveat is recorded in SCALE.md. Reported: list-size
        # max/mean (the n_probe/n_centroids scan-fraction claim holds only
        # when this is ~1) and routing recall of brute-force top-5.
        from cassandra_iot_pipeline_spark.functions.similarity import (
            _centroid_ranked,
            _coarse_centroids,
        )

        n_clustered = 100_000
        clustered = spark.range(n_clustered).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: (
                    F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) - 1000
                ).cast("double")
                / 1000.0,
            ).alias("embedding"),
        )
        truth = None
        for iters in (0, 2):
            t0 = time.perf_counter()
            cents = _coarse_centroids(clustered, 64, iters)
            ranked = _centroid_ranked(clustered, cents)
            lists = (
                ranked.filter(F.col("crank") == 1).groupBy("cent_vid").count()
            )
            row = lists.agg(
                F.max("count").alias("mx"), F.avg("count").alias("mean")
            ).first()
            results[f"coarse_iters{iters}_max_over_mean_list"] = round(
                row["mx"] / row["mean"], 2
            )
            results[f"coarse_iters{iters}_sec"] = round(
                time.perf_counter() - t0, 2
            )
            # routing recall: is a true top-5 neighbor's list probed
            # (n_probe=8) for its query?
            from cassandra_iot_pipeline_spark.functions.similarity import (
                cosine_topk,
            )

            if truth is None:
                truth = cosine_topk(clustered, n_queries=10, k=5).select(
                    "query_id", "cand_id"
                ).localCheckpoint(eager=True)
            cand_lists = ranked.filter(F.col("crank") == 1).select(
                F.col("vec_id").alias("cand_id"), F.col("cent_vid").alias("lst")
            )
            probe_lists = ranked.filter(
                (F.col("vec_id") < 10) & (F.col("crank") <= 8)
            ).select(F.col("vec_id").alias("query_id"), F.col("cent_vid").alias("lst"))
            hit = truth.join(cand_lists, "cand_id").join(
                probe_lists, ["query_id", "lst"]
            )
            results[f"coarse_iters{iters}_routing_recall"] = round(
                hit.count() / truth.count(), 2
            )
        print(
            f"[probe] coarse refine: balance "
            f"{results['coarse_iters0_max_over_mean_list']} -> "
            f"{results['coarse_iters2_max_over_mean_list']}, recall "
            f"{results['coarse_iters0_routing_recall']} -> "
            f"{results['coarse_iters2_routing_recall']}",
            file=sys.stderr, flush=True,
        )

        # Optional 1M-vector AnnIndexStore row (pass --ann-1m): build +
        # 10-query probe at 10x the standard probe's index size.
    if "--ann-1m" in sys.argv:
        big_dir = _tempfile.mkdtemp(prefix="scale_probe_ann1m_")
        try:
            n_big = 1_000_000
            big = spark.range(n_big).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda d: (
                        F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) - 1000
                    ).cast("double")
                    / 1000.0,
                ).alias("embedding"),
            )
            bidx = AnnIndexStore(big_dir)
            t0 = time.perf_counter()
            bidx.build(big, n_centroids=64)
            results["ann_store_build_1m"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            bidx.compact(spark)
            results["ann_store_compact_1m"] = round(
                time.perf_counter() - t0, 2
            )
            q10 = big.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            t0 = time.perf_counter()
            bidx.topk(q10, k=5, n_probe=8).write.format("noop").mode(
                "overwrite"
            ).save()
            results["ann_store_query_10_of_1m"] = round(
                time.perf_counter() - t0, 2
            )
        finally:
            _shutil.rmtree(big_dir, ignore_errors=True)
        print(
            f"[probe] ann_store 1m build/compact/query: "
            f"{results['ann_store_build_1m']}/"
            f"{results['ann_store_compact_1m']}/"
            f"{results['ann_store_query_10_of_1m']}s",
            file=sys.stderr, flush=True,
        )

    if "--hot-route" in sys.argv:
        # r6: the auto hot-bucket router at band-row scale. Two
        # questions a 100 TB reviewer asks of a new default: what does
        # the routing window (count + approx_count_distinct over the
        # bucket keys) cost on a frame DOMINATED by cold buckets, and
        # does per-bucket routing actually produce the star output on
        # the boilerplate bucket and the subshard output on the diverse
        # one when both live in the same frame?
        from cassandra_iot_pipeline_spark.functions.dedup import (
            _capped_bucket_pairs,
        )

        n_band_rows = 4_000_000
        cold = spark.range(n_band_rows).select(
            F.col("id").alias("doc_id"),
            F.lit(0).alias("band"),
            # population 8 per bucket — the fixture-like cold regime
            (F.col("id") % (n_band_rows // 8)).alias("bucket"),
            F.xxhash64(F.col("id")).alias("salt"),
        )
        hot = spark.range(n_band_rows, n_band_rows + 40_000).select(
            F.col("id").alias("doc_id"),
            F.lit(1).alias("band"),
            (F.col("id") % 2).cast("long").alias("bucket"),  # 2x 20k-row hot
            F.when(F.col("id") % 2 == 0, F.xxhash64(F.col("id")))
            .otherwise(F.lit(99))
            .cast("long")
            .alias("salt"),  # bucket 0 diverse, bucket 1 boilerplate
        )
        banded = cold.unionByName(hot).localCheckpoint(eager=True)
        counts: dict[str, dict[str, int]] = {}
        for mode in ("star", "subshard", "auto"):
            pairs = _capped_bucket_pairs(
                banded, ("band", "bucket"), 256, hot_bucket_mode=mode
            )
            t0 = time.perf_counter()
            pairs.write.format("noop").mode("overwrite").save()
            results[f"hot_route_{mode}"] = round(time.perf_counter() - t0, 2)
            is_hot = F.col("doc_a") >= n_band_rows
            diverse = is_hot & (F.col("doc_a") % 2 == 0)
            boiler = is_hot & (F.col("doc_a") % 2 == 1)
            row = pairs.agg(
                F.count(F.when(~is_hot, 1)).alias("cold"),
                F.count(F.when(diverse, 1)).alias("diverse"),
                F.count(F.when(boiler, 1)).alias("boiler"),
            ).first()
            counts[mode] = {k: row[k] for k in ("cold", "diverse", "boiler")}
            print(
                f"[probe] hot_route {mode}: {results[f'hot_route_{mode}']}s "
                f"{counts[mode]}",
                file=sys.stderr, flush=True,
            )
        # per-bucket routing contract: cold pairs identical everywhere;
        # auto == star on the boilerplate bucket, == subshard on the
        # diverse one
        assert counts["star"]["cold"] == counts["auto"]["cold"]
        assert counts["auto"]["boiler"] == counts["star"]["boiler"]
        assert counts["auto"]["diverse"] == counts["subshard"]["diverse"]
        assert counts["auto"]["diverse"] > counts["star"]["diverse"]
        results["hot_route_counts"] = counts  # type: ignore[assignment]

    if "--substrings" in sys.argv:
        # r6: substring dedup tiers at 10x fixture scale. The claim
        # under test: the hashed tier moves 8 bytes/gram through the
        # wide stages instead of ~k, and both tiers mark the same
        # spans when grams stay collision-free.
        from cassandra_iot_pipeline_spark.functions.substrings import (
            duplicated_spans,
        )

        # plant a real boilerplate run on 10% of docs — the random
        # shared-vocabulary corpus has no exact 40-char repeats of its
        # own, and an operator probe that marks nothing measures only
        # the happy path
        boiler = (
            " subscribe to our newsletter all rights reserved terms of"
            " service privacy policy"
        )
        sdocs = (
            probe_documents(spark, 20_000)
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.concat(F.col("text"), F.lit(boiler)),
                ).otherwise(F.col("text")),
            )
            .localCheckpoint(eager=True)
        )
        timed(
            "substring_spans_exact",
            duplicated_spans(sdocs, k=40),
            results,
        )
        timed(
            "substring_spans_hashed",
            duplicated_spans(sdocs, k=40, hash_shuffle=True),
            results,
        )
        n_ex = duplicated_spans(sdocs, k=40).count()
        n_h = duplicated_spans(sdocs, k=40, hash_shuffle=True).count()
        assert n_ex == n_h, (n_ex, n_h)
        results["substring_spans_rows"] = n_ex
        print(
            f"[probe] substring spans: {n_ex} rows, exact "
            f"{results['substring_spans_exact']}s vs hashed "
            f"{results['substring_spans_hashed']}s",
            file=sys.stderr, flush=True,
        )

        # r7 de-skew A/B, isolating the hot-KEY claim: each doc is a
        # unique ~8-char prefix + the same 2000-char constant run, so
        # ONE distinct gram carries ~23.5M of the ~23.6M position
        # rows and the dup-gram set is a single row (no broadcast-size
        # confound — that axis is measured separately below). The
        # legacy window plan (dup_join='window', pre-r7 default) lands
        # all 23.5M in a single task's Sort+Window; the r7 default
        # collapses them map-side in a partial HashAggregate and
        # broadcast-semi-joins the one-gram set back. Same spans.
        hot = (
            spark.range(12_000)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("u"), F.col("id"), F.lit(" "), F.lit("x" * 2_000)
                ).alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        hot_counts = {}
        for mode in ("window", "auto"):
            timed(
                f"substring_hotgram_{mode}",
                duplicated_spans(hot, k=40, dup_join=mode),
                results,
            )
            hot_counts[mode] = duplicated_spans(
                hot, k=40, dup_join=mode
            ).count()
        assert hot_counts["window"] == hot_counts["auto"], hot_counts
        # hashed tier under the same skew — the de-skew must hold when
        # the gram is an 8-byte hash too (same hot key, narrower rows)
        timed(
            "substring_hotgram_auto_hashed",
            duplicated_spans(hot, k=40, hash_shuffle=True),
            results,
        )
        results["substring_hotgram_rows"] = hot_counts["auto"]
        print(
            f"[probe] substring hot-gram: {hot_counts['auto']} spans, "
            f"window {results['substring_hotgram_window']}s vs auto "
            f"{results['substring_hotgram_auto']}s vs auto+hash "
            f"{results['substring_hotgram_auto_hashed']}s",
            file=sys.stderr, flush=True,
        )

        # the other axis: a DIVERSE duplicated-gram set (the r6 10%
        # shared-vocab corpus above has millions of distinct repeated
        # 40-char grams). There the exact tier's dup-gram build side
        # is large — the hashed tier shrinks it 5x (8-byte keys), and
        # is the prescribed 100 TB posture for such corpora; record
        # the exact window-vs-auto pair on that corpus too so the
        # trade is measured, not asserted.
        for mode in ("window", "auto"):
            timed(
                f"substring_vocab_{mode}",
                duplicated_spans(sdocs, k=40, dup_join=mode),
                results,
            )
        timed(
            "substring_vocab_auto_hashed",
            duplicated_spans(sdocs, k=40, hash_shuffle=True),
            results,
        )

    if "--substring-stream" in sys.argv:
        # r7: the continuous substring pipeline's per-epoch cost must
        # track the BATCH, not the accumulated gram store — the store
        # side of the count merge is semi-join-pruned to the batch's
        # own gram set before any exchange. 10 epochs of 2k docs (10%
        # boilerplate) against a store that grows by ~1M distinct
        # grams per epoch: flat-ish per-epoch times = the prune works.
        import shutil as _sh

        from cassandra_iot_pipeline_spark.streaming.substrings import (
            SubstringDedupPipeline,
        )

        boiler2 = (
            " subscribe to our newsletter all rights reserved terms of"
            " service privacy policy"
        )
        ss_dir = _tempfile.mkdtemp(prefix="scale_probe_substream_")
        try:
            # untimed warm-up pipeline (plan-shape JIT, store-dir setup)
            warm_pipe = SubstringDedupPipeline(f"{ss_dir}/warm", k=40)
            warm_pipe.write_batch(
                probe_documents(spark, 500).localCheckpoint(eager=True), 0
            )
            pipe = SubstringDedupPipeline(
                f"{ss_dir}/store", k=40, compact_every=4
            )
            ss_times = []
            for e in range(10):
                batch = (
                    probe_documents(spark, 2_000, start=e * 2_000)
                    .withColumn(
                        "text",
                        F.when(
                            F.col("doc_id") % 10 == 0,
                            F.concat(F.col("text"), F.lit(boiler2)),
                        ).otherwise(F.col("text")),
                    )
                    .localCheckpoint(eager=True)
                )
                t0 = time.perf_counter()
                pipe.write_batch(batch, epoch_id=e)
                ss_times.append(round(time.perf_counter() - t0, 2))
            results["substring_stream_epoch_secs"] = ss_times  # type: ignore[assignment]
            results["substring_stream_store_grams"] = pipe.gram_counts(
                spark
            ).count()
            print(
                f"[probe] substring_stream 10x2k epochs: {ss_times} "
                f"({results['substring_stream_store_grams']} stored "
                "grams)",
                file=sys.stderr, flush=True,
            )
        finally:
            _sh.rmtree(ss_dir, ignore_errors=True)

    if "--substring-approx" in sys.argv:
        # r8 (r7 verdict #7): the substring gram-store's 100 TB floor.
        # Exact mode stores 8 B per corpus-lifetime DISTINCT gram
        # (unbounded); approx mode stores a FIXED depth x width
        # Count-Min sketch with a one-sided over-marking contract.
        # Run the same 10x2k-doc replay through both and compare
        # store bytes + cut-text agreement.
        import os as _os
        import shutil as _sh3

        from cassandra_iot_pipeline_spark.streaming.substrings import (
            SubstringDedupPipeline,
        )

        def _du(path):
            total = 0
            for root, _, files in _os.walk(path):
                for f in files:
                    total += _os.path.getsize(_os.path.join(root, f))
            return total

        boiler3 = (
            " subscribe to our newsletter all rights reserved terms"
            " of service privacy policy"
        )
        sa_dir = _tempfile.mkdtemp(prefix="scale_probe_subapprox_")
        try:
            # min_count=50: the approx tier's sound regime is
            # heavy-hitter thresholds (min_count >> gram mass/width —
            # the sizing rule in streaming/substrings.py). The r8
            # first probe ran min_count=2 and measured the documented
            # failure mode: collision mass ~10 per bucket >= the
            # threshold, so 18,000/20,000 docs over-marked (SCALE.md).
            mc = 50
            pipes = {
                "exact": SubstringDedupPipeline(
                    f"{sa_dir}/exact", k=40, min_count=mc,
                    compact_every=4,
                ),
                "approx": SubstringDedupPipeline(
                    f"{sa_dir}/approx", k=40, min_count=mc,
                    compact_every=4,
                    counts="approx", cm_width=1 << 21, cm_depth=4,
                ),
            }
            sa_times: dict[str, list[float]] = {m: [] for m in pipes}
            for e in range(10):
                batch = (
                    probe_documents(spark, 2_000, start=e * 2_000)
                    .withColumn(
                        "text",
                        F.when(
                            F.col("doc_id") % 10 == 0,
                            F.concat(F.col("text"), F.lit(boiler3)),
                        ).otherwise(F.col("text")),
                    )
                    .localCheckpoint(eager=True)
                )
                for m, pipe in pipes.items():
                    t0 = time.perf_counter()
                    pipe.write_batch(batch, epoch_id=e)
                    sa_times[m].append(round(time.perf_counter() - t0, 2))
            for m, pipe in pipes.items():
                pipe.compact(spark)
                results[f"subapprox_{m}_store_bytes"] = _du(pipe.grams_dir)
                results[f"subapprox_{m}_epoch_secs"] = sa_times[m]  # type: ignore[assignment]
            # agreement: docs whose cut text differs (over-marking only)
            ex = pipes["exact"].curated(spark).select("doc_id", "text")
            ap = (
                pipes["approx"].curated(spark)
                .select("doc_id", F.col("text").alias("text_a"))
            )
            both = ex.join(ap, "doc_id")
            results["subapprox_docs"] = both.count()
            results["subapprox_docs_differing"] = both.filter(
                F.col("text") != F.col("text_a")
            ).count()
            print(
                f"[probe] substring approx vs exact: store bytes "
                f"{results['subapprox_approx_store_bytes']} vs "
                f"{results['subapprox_exact_store_bytes']}, "
                f"{results['subapprox_docs_differing']}/"
                f"{results['subapprox_docs']} docs differ",
                file=sys.stderr, flush=True,
            )
        finally:
            _sh3.rmtree(sa_dir, ignore_errors=True)

    if "--scd2-stream" in sys.argv:
        # r8 (r7 verdict #1): the streaming SCD2 maintainer's
        # per-epoch cost must track the BATCH, not the accumulated
        # dimension — the write path semi-prunes the raw store to the
        # batch's touched keys BELOW the winner-rule window, so the
        # per-epoch window exchange carries batch-proportional rows.
        # 10 equal-sized epochs, each touching a DISJOINT key range:
        # the dimension grows 10x while every batch stays the same
        # size — flat-ish per-epoch times = the prune works (the old
        # plan re-shuffled the whole dimension every epoch).
        import shutil as _sh2

        from cassandra_iot_pipeline_spark.streaming.scd2 import (
            Scd2Pipeline,
        )

        def scd2_updates(n_keys: int, start: int, epoch: int):
            # 2 updates per key (real version history), hash attrs,
            # collision-free (key, ts) — partition-invariant, no
            # driver data
            df = spark.range(2 * n_keys)
            key = F.lit(start) + F.pmod(F.col("id"), F.lit(n_keys))
            ts = F.timestamp_millis(
                F.lit(1704067200000)
                + (F.lit(epoch) * 400_000 + F.col("id")) * 1000
            )
            seg = F.conv(
                F.pmod(F.xxhash64(F.lit("s"), F.col("id")), F.lit(16)),
                10, 16,
            )
            return df.select(
                key.alias("user_id"), ts.alias("ts"), seg.alias("seg")
            )

        sc_dir = _tempfile.mkdtemp(prefix="scale_probe_scd2_")
        try:
            warm = Scd2Pipeline(
                f"{sc_dir}/warm", "user_id", ("seg",), "ts"
            )
            warm.write_batch(
                scd2_updates(1_000, 0, 0).localCheckpoint(eager=True), 0
            )
            pipe = Scd2Pipeline(
                f"{sc_dir}/store", "user_id", ("seg",), "ts",
                compact_every=4,
            )
            n_keys = 50_000
            sc_times = []
            for e in range(10):
                batch = scd2_updates(
                    n_keys, e * n_keys, e
                ).localCheckpoint(eager=True)
                t0 = time.perf_counter()
                pipe.write_batch(batch, epoch_id=e)
                sc_times.append(round(time.perf_counter() - t0, 2))
            results["scd2_stream_epoch_secs"] = sc_times  # type: ignore[assignment]
            results["scd2_stream_dim_rows"] = pipe.dimension(
                spark
            ).count()
            print(
                f"[probe] scd2_stream 10x{n_keys}-key epochs: "
                f"{sc_times} ({results['scd2_stream_dim_rows']} "
                "dimension rows)",
                file=sys.stderr, flush=True,
            )
        finally:
            _sh2.rmtree(sc_dir, ignore_errors=True)

    if "--dedup-batch" in sys.argv:
        # r6 verdict item #5: the r6 ADC-payload fix removed what r5
        # called "the binding constraint on raising dedup batch
        # sizes". Probe the claim: B = 2k / 10k / 20k epochs through
        # the FULL EmbeddingDedupPipeline write path against a 100k
        # int8 index, recording per-epoch wall time, vecs/s, and the
        # driver-collected + broadcast ADC payload (B tables of
        # m x ks x 8 bytes, shipped once, plus B x n_probe 16-byte id
        # pairs — deterministic from the geometry: m=8, ks=16,
        # n_probe=4).
        from cassandra_iot_pipeline_spark.streaming.ann import (
            EmbeddingDedupPipeline,
        )

        bdir = _tempfile.mkdtemp(prefix="scale_probe_bsz_")
        try:
            warm = EmbeddingDedupPipeline.bootstrap(
                probe_embeddings(0, 3_000),
                f"{bdir}/warm_idx",
                f"{bdir}/warm_cur",
                threshold=0.95,
            )
            warm.write_batch(probe_embeddings(3_000, 3_500), epoch_id=0)
            for bsz in (2_000, 10_000, 20_000):
                pipe = EmbeddingDedupPipeline.bootstrap(
                    probe_embeddings(0, n_vecs),
                    f"{bdir}/idx{bsz}",
                    f"{bdir}/cur{bsz}",
                    threshold=0.95,
                )
                b_times = []
                for e in range(2):
                    lo = n_vecs + e * bsz
                    b = probe_embeddings(lo, lo + bsz)
                    t0 = time.perf_counter()
                    pipe.write_batch(b, epoch_id=e)
                    b_times.append(round(time.perf_counter() - t0, 2))
                results[f"dedup_batch_{bsz}_epoch_secs"] = b_times  # type: ignore[assignment]
                results[f"dedup_batch_{bsz}_vecs_per_sec"] = round(
                    bsz / min(b_times), 1
                )
                results[f"dedup_batch_{bsz}_adc_payload_mb"] = round(
                    bsz * (8 * 16 * 8 + 4 * 16) / 1e6, 2
                )
                print(
                    f"[probe] dedup_batch B={bsz}: {b_times}s, "
                    f"{results[f'dedup_batch_{bsz}_vecs_per_sec']} vecs/s, "
                    f"payload {results[f'dedup_batch_{bsz}_adc_payload_mb']}"
                    " MB",
                    file=sys.stderr, flush=True,
                )
        finally:
            _shutil.rmtree(bdir, ignore_errors=True)

    if "--gapfill" in sys.argv:
        # r6: gapfill max_gap at the pathological shape it exists for —
        # 10k keys, 10 observations each, ~6 months of silence between
        # them. Uncapped, every observation fan-outs its whole gap run
        # (~4.38k hourly rows); max_gap=24 bounds each run to a day.
        from cassandra_iot_pipeline_spark.operators.gapfill import gapfill

        gap_hours = 4_380
        obs = spark.range(10_000 * 10).select(
            (F.col("id") % 10_000).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + (F.col("id") / 10_000).cast("long")
                * F.lit(gap_hours * 3600)
            ).alias("ts"),
            (F.pmod(F.col("id"), F.lit(997)) / 10.0).alias("value"),
        )
        t0 = time.perf_counter()
        capped = gapfill(obs, max_gap=24)
        n_capped = capped.count()
        results["gapfill_capped_24_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_full = gapfill(obs).count()
        results["gapfill_uncapped_sec"] = round(time.perf_counter() - t0, 2)
        results["gapfill_rows_capped"] = n_capped
        results["gapfill_rows_uncapped"] = n_full
        print(
            f"[probe] gapfill: uncapped {n_full} rows "
            f"{results['gapfill_uncapped_sec']}s, max_gap=24 {n_capped} "
            f"rows {results['gapfill_capped_24_sec']}s",
            file=sys.stderr, flush=True,
        )

    if "--funnel-retrieval" in sys.argv:
        # r8: the engagement-analytics and retrieval families at probe
        # scale. Funnel/transitions run over the full synthetic event
        # stream (the wide work is the one user-keyed exchange);
        # retrieval runs over the shared-vocabulary corpus with a
        # 200-question batch (the decontamination shape).
        from cassandra_iot_pipeline_spark.functions.expectations import (
            events_expectations,
        )
        from cassandra_iot_pipeline_spark.functions.retrieval import (
            bm25_batch,
            bm25_topk,
        )
        from cassandra_iot_pipeline_spark.operators.downsample import lttb
        from cassandra_iot_pipeline_spark.operators.funnel import funnel
        from cassandra_iot_pipeline_spark.operators.paths import (
            event_transitions,
        )

        timed(
            "funnel_4step_horizon7d",
            funnel(
                events,
                ["signup", "view", "click", "purchase"],
                horizon_seconds=7 * 86_400,
            ),
            results,
        )
        # r9 (r8 verdict #5): the hot-key bound. funnel's per-user fold
        # materializes each key's full step-typed event list in one
        # aggregation buffer — a bot key owning ~20% of the corpus puts
        # ~20% of step events into ONE task's collect_list. Measure a
        # skewed corpus (key 0 absorbs 1-in-5 events) against the
        # uniform row above; the delta is the single-task sort+fold.
        skewed = events.withColumn(
            "user_id",
            F.when(
                F.pmod(
                    F.xxhash64(F.lit("skew"), F.col("event_id")), F.lit(5)
                )
                == 0,
                F.lit(0),
            ).otherwise(F.col("user_id")),
        )
        timed(
            "funnel_4step_skewed_hotkey_20pct",
            funnel(
                skewed,
                ["signup", "view", "click", "purchase"],
                horizon_seconds=7 * 86_400,
            ),
            results,
        )
        # r10 (r9 verdict #4): the executable mitigation. Cap the
        # skewed corpus with the curation rule first (keep-earliest-N
        # per (key, type), salted so even the bot key's own sort is
        # split) — the claim under test is that the capped skewed
        # corpus runs at ~the uniform corpus's speed (the +14% skew
        # delta eliminated). The cap (10k/type) is far above any sane
        # key's volume (~400 events/type here), so only the bot key
        # loses rows.
        from cassandra_iot_pipeline_spark.functions.cleaning import (
            cap_events_per_key,
        )

        capped = cap_events_per_key(skewed, 10_000, salt_partitions=32)
        timed(
            "funnel_4step_skewed_capped_10k",
            funnel(
                capped,
                ["signup", "view", "click", "purchase"],
                horizon_seconds=7 * 86_400,
            ),
            results,
        )
        # a PATHOLOGICAL bot key (1-in-2 of the corpus on one key —
        # one task sorts ~10M step events): the regime the cap is FOR
        skewed50 = events.withColumn(
            "user_id",
            F.when(
                F.pmod(
                    F.xxhash64(F.lit("skew"), F.col("event_id")), F.lit(2)
                )
                == 0,
                F.lit(0),
            ).otherwise(F.col("user_id")),
        )
        timed(
            "funnel_4step_skewed_hotkey_50pct",
            funnel(
                skewed50,
                ["signup", "view", "click", "purchase"],
                horizon_seconds=7 * 86_400,
            ),
            results,
        )
        timed(
            "funnel_4step_skewed50_capped_10k",
            funnel(
                cap_events_per_key(skewed50, 10_000, salt_partitions=32),
                ["signup", "view", "click", "purchase"],
                horizon_seconds=7 * 86_400,
            ),
            results,
        )
        timed("event_transitions", event_transitions(events), results)
        from cassandra_iot_pipeline_spark.operators.funnel import (
            funnel_trend,
        )

        timed(
            "funnel_trend_daily",
            funnel_trend(
                events,
                ["signup", "view", "click", "purchase"],
                86_400,
                horizon_seconds=7 * 86_400,
            ),
            results,
        )
        from cassandra_iot_pipeline_spark.operators.cohorts import (
            growth_accounting,
            rolling_active,
        )

        timed(
            "rolling_active_wau",
            rolling_active(events, 7, period_seconds=86_400),
            results,
        )
        timed(
            "growth_accounting_daily",
            growth_accounting(events, period_seconds=86_400),
            results,
        )
        timed("expectations_audit", events_expectations(events), results)
        timed("lttb_500", lttb(events, 500, key="user_id"), results)

        # Stage the synthetic corpus to parquet first (the established
        # probe pattern): feeding the hash-generator expression tree
        # straight into the posting explode re-evaluates the 2000-way
        # vocab array per token — the transform()-lambda pathology
        # SCALE.md documents for shingling. Real corpora are parquet.
        import tempfile

        rdocs_dir = tempfile.mkdtemp(prefix="probe_bm25_")
        probe_documents(spark, 100_000).write.mode("overwrite").parquet(
            rdocs_dir
        )
        rdocs = spark.read.parquet(rdocs_dir)
        t0 = time.perf_counter()
        bm25_topk(rdocs, "word0001 word0042 word1999 word0500", k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        results["bm25_topk_100k_docs"] = round(time.perf_counter() - t0, 2)
        print(
            f"[probe] bm25_topk_100k_docs: {results['bm25_topk_100k_docs']}s",
            file=sys.stderr, flush=True,
        )
        queries = spark.createDataFrame(
            [
                (
                    q,
                    " ".join(
                        f"word{(q * 37 + j * 101) % 2000:04d}"
                        for j in range(6)
                    ),
                )
                for q in range(200)
            ],
            "query_id BIGINT, query_text STRING",
        )
        t0 = time.perf_counter()
        bm25_batch(rdocs, queries, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        results["bm25_batch_200q_100k_docs"] = round(
            time.perf_counter() - t0, 2
        )
        print(
            f"[probe] bm25_batch_200q_100k_docs: "
            f"{results['bm25_batch_200q_100k_docs']}s",
            file=sys.stderr, flush=True,
        )

    if "--bpe-stores" in sys.argv:
        # r8 third arc: BPE training cost per merge over a vocab-sized
        # word table, the HLL cardinality store's per-epoch write
        # flatness, hit-directed deletion, and the OHLC aggregation.
        import tempfile

        from cassandra_iot_pipeline_spark.forget import forget_keys_in_store
        from cassandra_iot_pipeline_spark.functions.bpe import (
            bpe_piece_counts,
            bpe_train,
        )
        from cassandra_iot_pipeline_spark.operators.timeseries import (
            ohlc_bars,
        )
        from cassandra_iot_pipeline_spark.streaming.cardinality import (
            CardinalityPipeline,
            distinct_counts,
            period_index,
        )
        from cassandra_iot_pipeline_spark.streaming.cohorts import (
            CohortPipeline,
        )

        # BPE: the claim under test is that per-merge cost is bounded
        # by the WORD TABLE, not the corpus — train on a 200k-word
        # synthetic vocabulary (hex tokens: a realistic 16-char,
        # 16-symbol alphabet) and report total + per-merge seconds.
        wc = spark.range(200_000).select(
            F.format_string("%x", F.xxhash64("id")).alias("w"),
            (F.pmod(F.xxhash64(F.lit("c"), F.col("id")), F.lit(999)) + 1).alias("c"),
        )
        n_m = 20
        t0 = time.perf_counter()
        model = bpe_train(wc, n_m, min_count=2)
        total = round(time.perf_counter() - t0, 2)
        results["bpe_train_200k_words_20_merges"] = total
        results["bpe_sec_per_merge"] = round(total / max(1, len(model.merges)), 2)
        print(
            f"[probe] bpe_train 200k words x {len(model.merges)} merges: "
            f"{total}s ({results['bpe_sec_per_merge']}s/merge)",
            file=sys.stderr, flush=True,
        )
        # encode a 100k-doc staged corpus with the learned merges (the
        # distinct-word confinement: Python touches ~2k words, never
        # the ~8M token occurrences)
        bdocs_dir = tempfile.mkdtemp(prefix="probe_bpe_")
        probe_documents(spark, 100_000).write.mode("overwrite").parquet(
            bdocs_dir
        )
        bdocs = spark.read.parquet(bdocs_dir)
        wmodel = bpe_train(
            bdocs.select(F.explode(F.split("text", " ")).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("c")),
            16,
        )
        timed(
            "bpe_piece_counts_100k_docs",
            bpe_piece_counts(bdocs, wmodel.merges),
            results,
        )
        from cassandra_iot_pipeline_spark.functions.bpe import (
            bpe_pack_blocks,
            bpe_vocab,
        )

        wvocab = bpe_vocab(
            bdocs.select(F.explode(F.split("text", " ")).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("c")),
            wmodel.merges,
        )
        timed(
            "bpe_pack_blocks_100k_docs",
            bpe_pack_blocks(bdocs, wmodel.merges, wvocab, 2048, 64),
            results,
        )

        # cardinality store: 5 epochs of 4M events each; per-epoch
        # write must stay flat (the store is never read on write)
        card_dir = tempfile.mkdtemp(prefix="probe_card_")
        card = CardinalityPipeline(card_dir, period_seconds=86_400)
        per_epoch = []
        for i in range(5):
            batch = probe_events(spark, 4_000_000, n_devices)
            t0 = time.perf_counter()
            card.write_batch(batch, epoch_id=i)
            per_epoch.append(round(time.perf_counter() - t0, 2))
        results["cardinality_epoch_secs"] = per_epoch
        t0 = time.perf_counter()
        card.estimates(spark).write.format("noop").mode("overwrite").save()
        results["cardinality_read_sec"] = round(time.perf_counter() - t0, 2)
        print(
            f"[probe] cardinality epochs {per_epoch}, read "
            f"{results['cardinality_read_sec']}s",
            file=sys.stderr, flush=True,
        )
        timed(
            "distinct_counts_exactish_20m",
            distinct_counts(
                events.withColumn("pi", period_index("ts", 86_400)),
                ["event_type", "pi"],
                "user_id",
            ),
            results,
        )

        # deletion: 8-epoch cohort point store, forget 100 of n_devices
        # keys — the labeled hit scan + only-hit-parts rewrite
        fdir = tempfile.mkdtemp(prefix="probe_forget_")
        cpipe = CohortPipeline(f"{fdir}/s", period_seconds=86_400)
        for i in range(8):
            cpipe.write_batch(
                probe_events(spark, 1_000_000, n_devices), epoch_id=i
            )
        victims = spark.range(100).select(
            F.pmod(F.xxhash64(F.lit("vic"), F.col("id")), F.lit(n_devices)).alias("k")
        )
        t0 = time.perf_counter()
        rep = forget_keys_in_store(spark, cpipe.pts_dir, victims, ["k"])
        results["forget_8epoch_store_sec"] = round(time.perf_counter() - t0, 2)
        results["forget_parts_rewritten"] = sum(r["rewritten"] for r in rep)
        print(
            f"[probe] forget store: {results['forget_8epoch_store_sec']}s, "
            f"{results['forget_parts_rewritten']}/{len(rep)} parts rewritten",
            file=sys.stderr, flush=True,
        )

        timed("ohlc_bars_hourly", ohlc_bars(events), results)

        from cassandra_iot_pipeline_spark.functions.sampling import (
            priority_sample,
        )
        from cassandra_iot_pipeline_spark.operators.cohorts import (
            retention_matrix_segmented,
        )
        from cassandra_iot_pipeline_spark.operators.stats import (
            mad_outliers,
        )

        timed(
            "priority_sample_k1000_20m",
            priority_sample(events, "event_id", "value", 1000),
            results,
        )
        seg_dim = spark.range(n_devices).select(
            F.col("id").alias("user_id"),
            F.concat(
                F.lit("seg"), F.pmod(F.xxhash64("id"), F.lit(5))
            ).alias("segment"),
        )
        timed(
            "retention_matrix_segmented_daily",
            retention_matrix_segmented(
                events, seg_dim, period_seconds=86_400
            ),
            results,
        )
        timed("mad_outliers_20m", mad_outliers(events), results)

    if "--funnel-stream" in sys.argv:
        # r9 (r8 verdict #7): the streaming funnel's READ path folds
        # the full point store — the one read in the engagement arcs
        # whose cost grows with corpus lifetime rather than
        # base+recent-deltas (inherent: the point set is the minimal
        # sufficient statistic for the non-monotone chain). Measure the
        # serving read against a store growing 10x, compacted before
        # each measured read so fold shape is constant.
        import tempfile

        from cassandra_iot_pipeline_spark.streaming.funnel import (
            FunnelPipeline,
        )

        steps = ["signup", "view", "click", "purchase"]
        fpipe = FunnelPipeline(
            tempfile.mkdtemp(prefix="probe_fstream_"),
            steps,
            horizon_seconds=7 * 86_400,
        )
        per_epoch = max(200_000, n_events // 10)
        measure_after = {0, 2, 9}
        for e in range(10):
            fpipe.write_batch(
                probe_events(spark, per_epoch, n_devices, start=e * per_epoch),
                epoch_id=e,
            )
            if e in measure_after:
                fpipe.compact(spark)
                t0 = time.perf_counter()
                fpipe.funnel(spark).write.format("noop").mode(
                    "overwrite"
                ).save()
                sec = round(time.perf_counter() - t0, 2)
                results[f"funnel_stream_read_{e + 1}x"] = sec
                print(
                    f"[probe] funnel_stream read after {e + 1} epochs "
                    f"({(e + 1) * per_epoch} events landed): {sec}s",
                    file=sys.stderr, flush=True,
                )

    if "--ddsketch-collapse" in sys.argv:
        # r10 (r9 verdict #5): the collapsing tier under an
        # adversarial long-tail group. One poisoned group spans the
        # FULL positive double range (~600 decades, 1e-300 .. 1e300 —
        # a broken sensor emitting garbage bit patterns) — the plain
        # sketch's range-ratio bound balloons to ~115 buckets/decade
        # at alpha=1%; the collapse pins it at max_buckets with the
        # alpha contract intact above the reported collapsed fraction.
        from cassandra_iot_pipeline_spark.operators.quantiles import (
            dd_quantiles,
            dd_sketch,
        )

        poisoned = spark.range(0, n_events).select(
            F.lit("sensor").alias("g"),
            # log-uniform across 600 decades: 10^(-300 + 600 * u)
            F.pow(
                F.lit(10.0),
                F.lit(-300.0)
                + F.lit(600.0)
                * (
                    F.pmod(
                        F.xxhash64(F.lit("v"), F.col("id")),
                        F.lit(1_000_000),
                    )
                    / F.lit(1_000_000.0)
                ),
            ).alias("value"),
        )
        for mb, label in ((None, "plain"), (512, "collapse512")):
            t0 = time.perf_counter()
            n_buckets = dd_sketch(
                poisoned, ["g"], "value", 0.01, max_buckets=mb
            ).count()
            results[f"ddsketch_{label}_buckets"] = n_buckets
            results[f"ddsketch_{label}_sketch_sec"] = round(
                time.perf_counter() - t0, 2
            )
            print(
                f"[probe] ddsketch_{label}: {n_buckets} buckets, "
                f"{results[f'ddsketch_{label}_sketch_sec']}s",
                file=sys.stderr, flush=True,
            )
        timed(
            "ddsketch_collapse512_read_p99",
            dd_quantiles(
                poisoned, ["g"], "value", (0.5, 0.99), 0.01,
                max_buckets=512,
            ),
            results,
        )

    if "--finalize-stream" in sys.argv:
        # r10 (r9 verdict #3 + #6): the lifetime-growing point stores'
        # declared-horizon tier. An ADVANCING stream (each epoch's
        # events shifted one 30-day month on) feeds two funnel stores
        # and two attribution stores; the *_fin_on pipelines finalize
        # (lateness = 1 day) before each measured read. Claims under
        # test: the unfinalized read grows with stored points (the r8
        # --funnel-stream law), the finalized read stays ~FLAT, and
        # the attribution store (which previously had no growth row at
        # all) gets both curves.
        import tempfile

        from cassandra_iot_pipeline_spark.streaming.attribution import (
            AttributionPipeline,
        )
        from cassandra_iot_pipeline_spark.streaming.funnel import (
            FunnelPipeline,
        )

        steps = ["signup", "view", "click", "purchase"]
        fp_off = FunnelPipeline(
            tempfile.mkdtemp(prefix="probe_ffin0_"), steps,
            horizon_seconds=7 * 86_400,
        )
        fp_on = FunnelPipeline(
            tempfile.mkdtemp(prefix="probe_ffin1_"), steps,
            horizon_seconds=7 * 86_400,
        )
        ap_off = AttributionPipeline(
            tempfile.mkdtemp(prefix="probe_afin0_"), "purchase",
            ("view", "click", "signup"), 86_400,
        )
        ap_on = AttributionPipeline(
            tempfile.mkdtemp(prefix="probe_afin1_"), "purchase",
            ("view", "click", "signup"), 86_400,
        )
        per_epoch = max(200_000, n_events // 10)
        month_us = 30 * 86_400 * 1_000_000
        measure_after = {0, 2, 9}
        for e in range(10):
            batch = probe_events(
                spark, per_epoch, n_devices, start=e * per_epoch
            ).withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros(F.col("ts")) + F.lit(e * month_us)
                ),
            )
            for pipe in (fp_off, fp_on, ap_off, ap_on):
                pipe.write_batch(batch, epoch_id=e)
            if e in measure_after:
                fp_off.compact(spark)
                ap_off.compact(spark)
                fp_on.finalize(spark, lateness_seconds=86_400)
                ap_on.finalize(spark, lateness_seconds=86_400)
                for name, reader in (
                    (f"funnel_fin_off_read_{e + 1}x",
                     lambda: fp_off.funnel(spark)),
                    (f"funnel_fin_on_read_{e + 1}x",
                     lambda: fp_on.funnel(spark)),
                    (f"attr_fin_off_read_{e + 1}x",
                     lambda: ap_off.report(spark)),
                    (f"attr_fin_on_read_{e + 1}x",
                     lambda: ap_on.report(spark)),
                ):
                    t0 = time.perf_counter()
                    reader().write.format("noop").mode("overwrite").save()
                    results[name] = round(time.perf_counter() - t0, 2)
                    print(
                        f"[probe] {name}: {results[name]}s",
                        file=sys.stderr, flush=True,
                    )

    if "--finalize-pass" in sys.argv:
        # r11 (r10 verdict #3 + #1): (A) the finalize() MAINTENANCE
        # pass itself — first-finalize cost over a 1x/3x/10x
        # accumulated store, steady-state per-call cost at
        # finalize_every in {4, 16}, and the GC compact_store share —
        # for both point-store pipelines; (B) the additive funnel
        # tier's population law: a GROWING ever-closed user population
        # (10k -> 100k -> 1M) with exact-tier reads expected to grow
        # and additive-tier reads expected ~flat.
        import tempfile

        import cassandra_iot_pipeline_spark.streaming.attribution as samod
        import cassandra_iot_pipeline_spark.streaming.funnel as sfmod
        from cassandra_iot_pipeline_spark.streaming.attribution import (
            AttributionPipeline,
        )
        from cassandra_iot_pipeline_spark.streaming.funnel import (
            FunnelPipeline,
        )

        steps = ["signup", "view", "click", "purchase"]
        month_us = 30 * 86_400 * 1_000_000
        per_epoch = max(200_000, n_events // 100)

        def adv_batch(e):
            return probe_events(
                spark, per_epoch, n_devices, start=e * per_epoch
            ).withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros(F.col("ts")) + F.lit(e * month_us)
                ),
            )

        def mk_funnel(tag, **kw):
            return FunnelPipeline(
                tempfile.mkdtemp(prefix=f"probe_fp_{tag}_"), steps,
                horizon_seconds=7 * 86_400, **kw,
            )

        def mk_attr(tag):
            return AttributionPipeline(
                tempfile.mkdtemp(prefix=f"probe_ap_{tag}_"), "purchase",
                ("view", "click", "signup"), 86_400,
            )

        # -- (A1) first-finalize cost over an accumulated store -------
        gc_secs = {"v": 0.0}
        real_cs = {"funnel": sfmod.compact_store, "attr": samod.compact_store}

        def timing_cs(mod, key):
            def wrapped(*a, **k):
                t0 = time.perf_counter()
                out = real_cs[key](*a, **k)
                gc_secs["v"] += time.perf_counter() - t0
                return out
            return wrapped

        sfmod.compact_store = timing_cs(sfmod, "funnel")
        samod.compact_store = timing_cs(samod, "attr")
        try:
            for acc in (1, 3, 10):
                fp, ap = mk_funnel(f"first{acc}"), mk_attr(f"first{acc}")
                for e in range(acc):
                    b = adv_batch(e)
                    fp.write_batch(b, epoch_id=e)
                    ap.write_batch(b, epoch_id=e)
                for key, pipe in (("funnel", fp), ("attr", ap)):
                    gc_secs["v"] = 0.0
                    t0 = time.perf_counter()
                    pipe.finalize(spark, lateness_seconds=86_400)
                    total = round(time.perf_counter() - t0, 2)
                    results[f"{key}_first_finalize_{acc}x"] = total
                    results[f"{key}_first_finalize_{acc}x_gc"] = round(
                        gc_secs["v"], 2
                    )
                    print(
                        f"[probe] {key}_first_finalize_{acc}x: {total}s "
                        f"(gc {results[f'{key}_first_finalize_{acc}x_gc']}s)",
                        file=sys.stderr, flush=True,
                    )

            # -- (A2) steady-state per-call cost at two cadences -------
            for every in (4, 16):
                fp, ap = mk_funnel(f"cad{every}"), mk_attr(f"cad{every}")
                calls: dict[str, list[float]] = {"funnel": [], "attr": []}
                gcs: dict[str, list[float]] = {"funnel": [], "attr": []}
                for e in range(16):
                    b = adv_batch(e)
                    fp.write_batch(b, epoch_id=e)
                    ap.write_batch(b, epoch_id=e)
                    if (e + 1) % every == 0:
                        for key, pipe in (("funnel", fp), ("attr", ap)):
                            gc_secs["v"] = 0.0
                            t0 = time.perf_counter()
                            pipe.finalize(spark, lateness_seconds=86_400)
                            calls[key].append(time.perf_counter() - t0)
                            gcs[key].append(gc_secs["v"])
                for key in ("funnel", "attr"):
                    cs = calls[key]
                    steady = cs[1:] if len(cs) > 1 else cs
                    results[f"{key}_finalize_every{every}_percall"] = round(
                        sum(steady) / len(steady), 2
                    )
                    results[f"{key}_finalize_every{every}_gc_share"] = round(
                        sum(gcs[key]) / max(sum(cs), 1e-9), 2
                    )
                    print(
                        f"[probe] {key}_finalize_every{every}: "
                        f"per-call {results[f'{key}_finalize_every{every}_percall']}s, "
                        f"gc share {results[f'{key}_finalize_every{every}_gc_share']}",
                        file=sys.stderr, flush=True,
                    )
        finally:
            sfmod.compact_store = real_cs["funnel"]
            samod.compact_store = real_cs["attr"]

        # -- (B) growing ever-closed population: exact vs additive ----
        fsteps = ["signup", "view", "purchase"]
        ex = FunnelPipeline(
            tempfile.mkdtemp(prefix="probe_pop_ex_"), fsteps,
            horizon_seconds=3_600,
        )
        ad = FunnelPipeline(
            tempfile.mkdtemp(prefix="probe_pop_ad_"), fsteps,
            horizon_seconds=3_600, fin_mode="additive",
        )

        def pop_cohort(n_users, start_user, base_us):
            # 3 funnel events per user, per-user jittered latencies so
            # the additive sketch sees a realistic bucket spread
            u = spark.range(n_users).select(
                (F.col("id") + start_user).alias("user_id")
            )
            evs = u.select(
                "user_id",
                F.explode(
                    F.array(
                        F.struct(
                            F.lit("signup").alias("event_type"),
                            F.lit(0).cast("long").alias("off"),
                        ),
                        F.struct(
                            F.lit("view").alias("event_type"),
                            F.lit(60_000_000).cast("long").alias("off"),
                        ),
                        F.struct(
                            F.lit("purchase").alias("event_type"),
                            F.lit(120_000_000).cast("long").alias("off"),
                        ),
                    )
                ).alias("e"),
            )
            return evs.select(
                "user_id",
                F.col("e.event_type").alias("event_type"),
                F.timestamp_micros(
                    F.lit(base_us)
                    + F.col("e.off")
                    + F.pmod(F.col("user_id"), F.lit(997)) * F.lit(13_001)
                ).alias("ts"),
            )

        # the LAW rows are the CONSTANT-WORK probes at each population
        # level: a tiny (1k-user) cohort finalize and a read — any
        # growth left in them is population-dependent cost (the exact
        # tier's fin-key anti-join + fin-row fold), not batch cost
        # (each stage's own bulk fold is batch-proportional in BOTH
        # tiers and would mask the law)
        epoch_no = 0
        start_user = 0
        cum = 0
        for si, n_users in enumerate((10_000, 90_000, 900_000)):
            base_us = (si + 1) * 3 * month_us
            for chunk0 in range(0, n_users, 300_000):
                n_chunk = min(300_000, n_users - chunk0)
                b = pop_cohort(n_chunk, start_user + chunk0, base_us)
                ex.write_batch(b, epoch_id=epoch_no)
                ad.write_batch(b, epoch_id=epoch_no)
                epoch_no += 1
            start_user += n_users
            cum += n_users
            # a pin epoch a month on closes the whole stage (far-away
            # user ids so pins never merge into a real stage's chains)
            pin = pop_cohort(
                10, 10_000_000 + 100 * si, base_us + month_us
            )
            ex.write_batch(pin, epoch_id=epoch_no)
            ad.write_batch(pin, epoch_id=epoch_no)
            epoch_no += 1
            for key, pipe in (("exact", ex), ("additive", ad)):
                t0 = time.perf_counter()
                out = pipe.finalize(spark, lateness_seconds=86_400)
                fsec = round(time.perf_counter() - t0, 2)
                results[f"pop_{key}_bulkfinalize_{cum}u"] = fsec
                print(
                    f"[probe] pop {key} bulk at {cum} users: "
                    f"finalize {fsec}s (closed {out['finalized_users']})",
                    file=sys.stderr, flush=True,
                )
            # constant-work probes at this population level
            tiny = pop_cohort(
                1_000, 20_000_000 + 10_000 * si, base_us + month_us + 86_400_000_000
            )
            pin2 = pop_cohort(
                10, 30_000_000 + 100 * si, base_us + 2 * month_us
            )
            ex.write_batch(tiny, epoch_id=epoch_no)
            ad.write_batch(tiny, epoch_id=epoch_no)
            epoch_no += 1
            ex.write_batch(pin2, epoch_id=epoch_no)
            ad.write_batch(pin2, epoch_id=epoch_no)
            epoch_no += 1
            for key, pipe in (("exact", ex), ("additive", ad)):
                t0 = time.perf_counter()
                out = pipe.finalize(spark, lateness_seconds=86_400)
                fsec = round(time.perf_counter() - t0, 2)
                results[f"pop_{key}_tinyfinalize_{cum}u"] = fsec
                t0 = time.perf_counter()
                pipe.funnel(spark).write.format("noop").mode(
                    "overwrite"
                ).save()
                rsec = round(time.perf_counter() - t0, 2)
                results[f"pop_{key}_read_{cum}u"] = rsec
                print(
                    f"[probe] pop {key} at {cum} users: CONSTANT-WORK "
                    f"finalize {fsec}s (closed {out['finalized_users']}),"
                    f" read {rsec}s",
                    file=sys.stderr, flush=True,
                )

    if "--quantiles-lines" in sys.argv:
        # r9: DDSketch store write flatness + read cost, and the C4
        # line-dedup rule over a multi-line corpus (probe_documents is
        # single-line; break ~25% of word gaps into newlines and plant
        # a boilerplate footer on 10% of docs).
        import tempfile

        from cassandra_iot_pipeline_spark.functions.cleaning import (
            dedup_lines,
        )
        from cassandra_iot_pipeline_spark.streaming.quantiles import (
            QuantilePipeline,
        )

        qp = QuantilePipeline(
            tempfile.mkdtemp(prefix="probe_dd_"),
            ["event_type"],
            "value",
            alpha=0.01,
            compact_every=4,
        )
        per_epoch = max(200_000, n_events // 10)
        secs = []
        for e in range(10):
            b = probe_events(spark, per_epoch, n_devices, start=e * per_epoch)
            t0 = time.perf_counter()
            qp.write_batch(b, epoch_id=e)
            secs.append(round(time.perf_counter() - t0, 2))
        results["ddsketch_epoch_first"] = secs[0]
        results["ddsketch_epoch_last"] = secs[-1]
        print(f"[probe] ddsketch 10x{per_epoch} epochs: {secs}",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        qp.quantiles(spark, (0.5, 0.95, 0.99)).write.format("noop").mode(
            "overwrite"
        ).save()
        results["ddsketch_read"] = round(time.perf_counter() - t0, 2)
        print(f"[probe] ddsketch read: {results['ddsketch_read']}s",
              file=sys.stderr, flush=True)

        ldocs_dir = tempfile.mkdtemp(prefix="probe_lines_")
        boiler = (
            "subscribe to our newsletter all rights reserved terms"
        )
        (
            probe_documents(spark, 100_000)
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.concat(F.col("text"), F.lit("\n" + boiler)),
                ).otherwise(F.col("text")),
            )
            .withColumn(
                "text",
                F.regexp_replace(
                    "text", " (word\\d*1) ", "\n$1\n"
                ),
            )
            .write.mode("overwrite")
            .parquet(ldocs_dir)
        )
        ldocs = spark.read.parquet(ldocs_dir)
        for hs, label in ((False, "exact"), (True, "hashed")):
            timed(
                f"dedup_lines_100k_{label}",
                dedup_lines(ldocs, min_line_chars=10, hash_shuffle=hs),
                results,
            )

    if "--attribution" in sys.argv:
        # r9: attribution cost is driven by the conversion x
        # in-window-touch PAIR count — inherent to the model (linear
        # credit needs each conversion's n), not to the join strategy
        # (the two-bucket probe bounds candidates). The synthetic
        # corpus is ~70x denser per user than a real event stream
        # (2000 events/user/month), so lookbacks sweep the pair count.
        from cassandra_iot_pipeline_spark.operators.attribution import (
            asof_attribution,
            attribution,
            first_last_attribution,
        )

        for lb, label in ((3600, "1h"), (86_400, "24h")):
            timed(
                f"attribution_{label}_lookback",
                attribution(
                    events,
                    "purchase",
                    ("view", "click", "signup"),
                    lb,
                ),
                results,
            )
            # the pair-free positional fast path: cost must be flat
            # across lookbacks (two union-tag windows, no pairs)
            timed(
                f"first_last_attribution_{label}_lookback",
                first_last_attribution(
                    events,
                    "purchase",
                    ("view", "click", "signup"),
                    lb,
                ),
                results,
            )
            # r10: the pair-free FULL report (linear included) — one
            # user-keyed sort carrying per-channel running counts;
            # the claim under test is lookback-independence of the
            # COMPLETE model set (24h within ~1.5x of 1h)
            timed(
                f"asof_attribution_{label}_lookback",
                asof_attribution(
                    events,
                    "purchase",
                    ("view", "click", "signup"),
                    lb,
                ),
                results,
            )
            # r11: time-decay on the same machinery with K+1 markers
            # per conversion (K = lookback/half_life) vs its pair
            # twin — the claim is that the marker fan-out (25 rows per
            # conversion at 24h/1h) still beats pairs-per-conversion,
            # and the form inherits the lookback-flatness law
            hl = 360 if lb == 3600 else 3600
            from cassandra_iot_pipeline_spark.operators.attribution import (
                time_decay_attribution,
                time_decay_attribution_pairs,
            )

            timed(
                f"time_decay_{label}_lookback_k{lb // hl}",
                time_decay_attribution(
                    events,
                    "purchase",
                    ("view", "click", "signup"),
                    lb,
                    hl,
                ),
                results,
            )
            timed(
                f"time_decay_pairs_{label}_lookback_k{lb // hl}",
                time_decay_attribution_pairs(
                    events,
                    "purchase",
                    ("view", "click", "signup"),
                    lb,
                    hl,
                ),
                results,
            )

    if "--topk" in sys.argv:
        # r9: the Misra-Gries heavy-hitters store. Claims under test:
        # per-epoch write work is batch-local (flat against store
        # growth), the compacted base is m+1 rows per group however
        # long the stream, and the read folds bounded rows.
        import tempfile

        from cassandra_iot_pipeline_spark.streaming.topk import TopKPipeline

        tp = TopKPipeline(
            tempfile.mkdtemp(prefix="probe_topk_"),
            group_cols=["event_type"],
            token_col="user_id",
            m=256,
            compact_every=4,
        )
        per_epoch = max(200_000, n_events // 10)
        epoch_secs = []
        for e in range(10):
            b = probe_events(spark, per_epoch, n_devices, start=e * per_epoch)
            t0 = time.perf_counter()
            tp.write_batch(b, epoch_id=e)
            epoch_secs.append(round(time.perf_counter() - t0, 2))
        results["topk_epoch_first"] = epoch_secs[0]
        results["topk_epoch_last"] = epoch_secs[-1]
        print(
            f"[probe] topk 10x{per_epoch} epochs: {epoch_secs}",
            file=sys.stderr, flush=True,
        )
        t0 = time.perf_counter()
        tp.topk(spark, k=10).write.format("noop").mode("overwrite").save()
        results["topk_read"] = round(time.perf_counter() - t0, 2)
        base = spark.read.parquet(f"{tp.mg_dir}/base_upto=7")
        rows_per_group = (
            base.groupBy("event_type").count().agg(F.max("count")).first()[0]
        )
        results["topk_base_max_rows_per_group"] = int(rows_per_group)
        print(
            f"[probe] topk read: {results['topk_read']}s; base max "
            f"rows/group: {rows_per_group} (m+1 = 257)",
            file=sys.stderr, flush=True,
        )

    if "--bpe-multi" in sys.argv:
        # r9 (r8 verdict #2): the merges_per_iter tier's realistic-vocab
        # posture. bpe_train is inherently one-driver-round-per-
        # iteration; N=1 is exact reference BPE at ~1 s/round, which is
        # ~10 h for a production 30k-merge vocab. N=16 commits up to 16
        # DISJOINT pairs per round (stale counts stay exact under
        # disjointness; only merge ORDER can diverge). Train a >=2k-
        # merge vocab at N=16 on the 200k-word hex table, plus an N=1
        # run of 128 merges for the per-merge comparison (r8 measured
        # N=1 FLAT at 1.18 s/merge over the same table, so the short
        # run is representative).
        from cassandra_iot_pipeline_spark.functions.bpe import bpe_train

        wc = spark.range(200_000).select(
            F.format_string("%x", F.xxhash64("id")).alias("w"),
            (
                F.pmod(F.xxhash64(F.lit("c"), F.col("id")), F.lit(999)) + 1
            ).alias("c"),
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        m1 = bpe_train(wc, 128, min_count=2, merges_per_iter=1)
        sec1 = round(time.perf_counter() - t0, 2)
        results["bpe_train_n1_128_merges"] = sec1
        results["bpe_n1_sec_per_merge"] = round(sec1 / max(1, len(m1.merges)), 3)
        print(
            f"[probe] bpe_train N=1: {len(m1.merges)} merges in {sec1}s "
            f"({results['bpe_n1_sec_per_merge']}s/merge)",
            file=sys.stderr, flush=True,
        )
        t0 = time.perf_counter()
        m16 = bpe_train(wc, 2048, min_count=2, merges_per_iter=16)
        sec16 = round(time.perf_counter() - t0, 2)
        results["bpe_train_n16_2048_merges"] = sec16
        results["bpe_n16_sec_per_merge"] = round(
            sec16 / max(1, len(m16.merges)), 3
        )
        print(
            f"[probe] bpe_train N=16: {len(m16.merges)} merges in {sec16}s "
            f"({results['bpe_n16_sec_per_merge']}s/merge)",
            file=sys.stderr, flush=True,
        )

    if "--monitors" in sys.argv:
        # r8 third arc: the drift-monitoring family at probe scale.
        import tempfile

        from cassandra_iot_pipeline_spark.functions.bpe import (
            bpe_train,
            bpe_vocab,
            bpe_word_counts,
            tokenizer_report,
        )
        from cassandra_iot_pipeline_spark.operators.changepoints import (
            cusum_changepoints,
        )
        from cassandra_iot_pipeline_spark.streaming.embedding_drift import (
            EmbeddingDriftPipeline,
        )

        mdocs_dir = tempfile.mkdtemp(prefix="probe_mon_")
        probe_documents(spark, 100_000).write.mode("overwrite").parquet(
            mdocs_dir
        )
        mdocs = spark.read.parquet(mdocs_dir)
        wc = bpe_word_counts(mdocs)
        model = bpe_train(wc, 16)
        vocab = bpe_vocab(wc, model.merges)
        timed(
            "tokenizer_report_100k_docs",
            tokenizer_report(mdocs, model.merges, vocab),
            results,
        )

        # embedding drift: 5 epochs x 200k 32-dim vectors against a
        # frozen 64-list codebook; per-epoch write must stay flat
        dims, n_vec = 32, 200_000
        def _vecs(start):
            return spark.range(start, start + n_vec).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dims - 1)),
                    lambda d: (
                        F.pmod(F.xxhash64("id", d), F.lit(1000)) / 500.0
                        - 1.0
                    ),
                ).alias("embedding"),
            )
        cents = _vecs(10**9).limit(64)
        ed_dir = tempfile.mkdtemp(prefix="probe_ed_")
        epipe = EmbeddingDriftPipeline(ed_dir, cents)
        e_times = []
        for i in range(5):
            batch = _vecs(i * n_vec)
            t0 = time.perf_counter()
            epipe.write_batch(batch, epoch_id=i)
            e_times.append(round(time.perf_counter() - t0, 2))
        results["embedding_drift_epoch_secs"] = e_times
        t0 = time.perf_counter()
        epipe.drift(spark).write.format("noop").mode("overwrite").save()
        results["embedding_drift_read_sec"] = round(
            time.perf_counter() - t0, 2
        )
        print(
            f"[probe] embedding_drift epochs {e_times}, drift read "
            f"{results['embedding_drift_read_sec']}s",
            file=sys.stderr, flush=True,
        )

        # CUSUM over a wide series corpus: 100k groups x 50 epochs
        series = spark.range(100_000 * 50).select(
            (F.col("id") % 100_000).alias("g"),
            F.expr("id div 100000").alias("epoch"),
            (
                F.pmod(F.xxhash64("id"), F.lit(100)) / 100.0
                + F.when(
                    (F.col("id") % 100_000 < 1000)
                    & (F.expr("id div 100000") >= 25),
                    F.lit(3.0),
                ).otherwise(F.lit(0.0))
            ).alias("m"),
        )
        timed(
            "cusum_100k_groups_50_epochs",
            cusum_changepoints(series, ["g"], "m", k=0.2, h=2.0),
            results,
        )

    rollup_rows_per_sec = (
        round(n_events / results["hourly_rollup"])
        if "hourly_rollup" in results
        else None
    )
    print(
        json.dumps(
            {
                "n_events": n_events,
                "n_devices": n_devices,
                "timings_sec": results,
                "hourly_rollup_rows_per_sec": rollup_rows_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
