"""Write PLANS.md: formatted physical plans of the headline queries with
the scale-relevant properties annotated. Run at sf0.1.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from cassandra_iot_pipeline_spark.plans import formatted_plan  # noqa: E402
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

SHOWCASE = {
    "funnel": (
        "Ordered k-step funnel (driver-registered r9): the step-type IN "
        "predicate is in PushedFilters, so the ONE user-keyed Exchange "
        "carries only funnel-typed events; the greedy chain is a "
        "sort_array + aggregate() higher-order fold inside the "
        "projection (no per-row Python, no self-joins); everything "
        "above the fold is user- then k-bounded."
    ),
    "pricing_summary": (
        "All predicates in PushedFilters; 7-column ReadSchema out of 16; "
        "whole-stage codegen spans the scan->partial-agg pipeline."
    ),
    "enrich_customers": (
        "Both dimension joins are BroadcastHashJoin — the fact side never "
        "shuffles (the J1 enrichment plan)."
    ),
    "point_lookup": (
        "Equality predicate pushed to the scan; orderBy+limit compiles to "
        "TakeOrderedAndProject (heap top-k, no global sort)."
    ),
    "latest_n_per_device": (
        "Single Exchange on user_id; rank filter evaluated inside the "
        "window stage."
    ),
    "latest_order_asof": (
        "As-of via union-tag: one Exchange on the key, one in-partition "
        "sort, forward-fill window — no range explosion."
    ),
    "gapfill_hourly": (
        "Hypertable gap-fill via lead()-anchored gap-run expansion: one "
        "raw scan, Exchange to the hourly aggregate, one lead() window "
        "over the ~10^3x-smaller aggregate, Generate(sequence) emits "
        "each observation's own gap run carrying its LOCF value and "
        "interpolation anchors — no spine, no join-back, no "
        "IGNORE-NULLS search."
    ),
}


def _extras(spark, sf_dir):
    """Library operators outside the driver registry whose plan shape
    is worth pinning in the document."""
    from pyspark.sql import functions as F

    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions import cleaning

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    return {
        "contamination_overlap": (
            "Shingles explode through a Generate over a materialized "
            "token array (tokenizer runs once per doc, not per "
            "shingle); benchmark side reduces to distinct 8-byte "
            "hashes and broadcasts; ONE Exchange total (the per-doc "
            "aggregate, with map-side partial distinct).",
            cleaning.contamination_overlap(docs, bench),
        ),
        "time_decay_attribution": (
            "Half-life time-decay attribution (r11): K+1 marker rows "
            "per conversion ride ONE user-keyed sort (forward + "
            "reversed running fills — no unbounded-FOLLOWING frame, "
            "the linted O(rows^2) class); bucket counts are "
            "running-count differences, weights exact BIGINT "
            "bit-shifts. No Join anywhere.",
            _time_decay(spark, sf_dir),
        ),
        "pack_concat": (
            "Concat-and-chunk packing layout: the running-offset "
            "window partitions by shard — hashpartitioning Exchange, "
            "never a SinglePartition global sort.",
            cleaning.pack_concat(docs, 2048, 64),
        ),
        "ivf_topk_exact_assignment": (
            "IVF ANN, exact-assignment tier: the centroid table joins "
            "as a BroadcastHashJoin (well, a broadcast nested product "
            "of 16 rows) and the ranking runs entirely in codegen — "
            "no ArrowEvalPython stage anywhere in the plan, unlike the "
            "gemm tier. The candidate re-rank joins on the 8-byte list "
            "id only.",
            _ivf_exact(spark, sf_dir),
        ),
        "bloom_incremental_dedup": (
            "Bloom landing dedup: batch keys probe the sketch through "
            "a BroadcastHashJoin on word_idx (8-byte probe rows, no "
            "payload); only the bloom-positive branch reaches the "
            "exact left-anti join against the corpus keys.",
            _bloom_dedup(spark, sf_dir),
        ),
        "near_dedup_store_probe": (
            "Incremental near-dup dedup, store-probe stage: the batch's "
            "band rows broadcast against the persisted band store — "
            "BroadcastHashJoin on (band, bucket), the store side never "
            "shuffles however large the corpus index grows (the r4 "
            "hot-bucket caps keep that property: batch-side capping is "
            "a window over the already-broadcast side, store-side "
            "capping a broadcast bucket-stats filter). The payload "
            "(shingle) joins downstream move rows only for candidate "
            "ids.",
            _near_dedup_probe(spark, sf_dir),
        ),
        "capped_lsh_candidates": (
            "Hot-bucket-capped LSH candidate generation "
            "(candidate_pairs_from_bands, r4): ONE Exchange on "
            "(band, bucket) into an ObjectHashAggregate collecting "
            "each bucket's sorted member array; the pair expansion — "
            "all-pairs under the cap, hub-star above it — is a pure "
            "array-expression branch inside the projection, so there "
            "is NO self-join and no second pass over the signature "
            "pipeline; the only other Exchange is the final pair "
            "distinct. A boilerplate bucket of k docs emits k-1 star "
            "pairs instead of k^2/2. Since r6 this is the shape "
            "'auto' takes on SALT-LESS band rows (the persisted "
            "stores' frames); salt-bearing rows get the per-bucket "
            "router below.",
            _capped_candidates(spark, sf_dir),
        ),
        "scd2_merge": (
            "SCD2 incremental merge (r7): both dimension probes — the "
            "semi-join routing touched keys into the recompute and the "
            "anti-join passing untouched keys through — are "
            "BroadcastHashJoin on the batch's distinct key set, so the "
            "dimension side never shuffles for routing however large "
            "the version table grows; the snapshot recompute's window "
            "exchange carries only the touched keys' rows "
            "(batch-proportional).",
            _scd2_merge(spark, sf_dir),
        ),
        "time_weighted_avg": (
            "Hypertable serving (r6): LOCF time-weighted average over "
            "irregular samples. One scan, one Exchange into the "
            "per-key window (lead pairs each sample with its "
            "successor), then the groupBy reuses that clustering — no "
            "joins, no second scan; the BIGINT units x seconds "
            "numerator is partial-aggregable so partition layout "
            "cannot perturb the result.",
            _time_weighted(spark, sf_dir),
        ),
        "substring_dedup_spans": (
            "Exact substring dedup (Lee-et-al semantics without the "
            "suffix array), de-skewed in r7: duplicated grams come "
            "from groupBy(g).count() — the partial HashAggregate "
            "collapses a boilerplate gram to one row per task BEFORE "
            "the exchange — then a LeftSemi join back onto the "
            "positions frame that AQE broadcast-converts when the "
            "dup-gram set fits (it does here; at scale the fallback "
            "is AQE skew-split + the native runtime bloom-filter "
            "join). NO window operator is keyed on the gram anymore "
            "(the pre-r7 Sort+Window-on-g landed every occurrence of "
            "a hot gram in one task); the two remaining windows are "
            "the per-doc span merge, partitioned by doc_id. "
            "hash_shuffle=True swaps the gram string for xxhash64 "
            "before any wide stage (8 bytes/gram in both the count "
            "exchange and the broadcast set).",
            _substring_spans(spark, sf_dir),
        ),
        "subshard_lsh_candidates": (
            "Salted hot-bucket routing — since r6 the DEFAULT "
            "(hot_bucket_mode='auto') whenever the band rows carry a "
            "salt: the salt column rides the band rows from the "
            "signature stage; bucket population AND the per-bucket "
            "diversity signal (approx_count_distinct of the salt — "
            "fixed-memory HLL) come from ONE window over the bucket "
            "keys; shard assignment is a pure projection (diverse hot "
            "buckets pmod-salt into sub-shards, near-constant-salt "
            "boilerplate keeps shard 0 = the single-hub star). Still "
            "no self-join: one Exchange into the collect_list "
            "aggregate (keyed by (band, bucket, _shard)) plus the "
            "final pair distinct; a diverse hot bucket all-pairs "
            "within ~cap-sized shards instead of losing non-hub "
            "pairs.",
            _subshard_candidates(spark, sf_dir),
        ),
        "conversion_pairs": (
            "Range join via window-length bucketing: equi-join on "
            "(user, bucket) with the exact range filter after — "
            "candidates bounded to two buckets per row. (Displaced "
            "from the registry in r8 — scd2_snapshot took its slot; "
            "the identical pair logic stays driver-checked through "
            "streaming_conversion_pairs.)",
            _conversion_pairs(spark, sf_dir),
        ),
        "hourly_rollup": (
            "The reference's flagship rollup (displaced to legacy "
            "parity in r9 — still smoke-run by entry() and "
            "driver-checked via streaming_hourly_rollup): 3-column "
            "pruned scan -> partial HashAggregate (map-side combine) "
            "-> single Exchange on (device, hour) -> final "
            "HashAggregate. Shuffle carries aggregate rows only.",
            _hourly_rollup(spark, sf_dir),
        ),
        "bm25_topk": (
            "BM25 ranked retrieval (r8): the query's term IN filter "
            "sits under the posting aggregation, so the wide work is "
            "proportional to the query terms' posting lists; the idf "
            "map enters as driver-computed literals (q bounded "
            "values, keeps the JVM's 1-ulp-different Math.log out of "
            "the plan); per-doc scores fold deterministically in "
            "sorted term order; the ranked read compiles to "
            "TakeOrderedAndProject (heap top-k, no global sort).",
            _bm25(spark, sf_dir),
        ),
        "bm25_batch_decontaminate": (
            "Batch BM25 decontamination (r8): query terms and the "
            "query-vocabulary idf frame both BroadcastHashJoin onto "
            "the postings — the posting side never reshuffles for "
            "routing however many eval questions probe it; ranking "
            "is a row_number window per query over that query's own "
            "candidates.",
            _bm25_batch(spark, sf_dir),
        ),
        "event_transitions": (
            "First-order path matrix (r8): one events-wide Exchange "
            "for the per-key (ts, id)-ordered lag window, then a "
            "partial-aggregable groupBy whose exchange carries at "
            "most |types|^2 rows per task; the row-total window runs "
            "over the matrix, not the events.",
            _transitions(spark, sf_dir),
        ),
        "expectations_report": (
            "Data-quality audit (r8): every declared check compiles "
            "into ONE aggregation over ONE scan (count-distinct "
            "included via the two-phase distinct aggregate); the "
            "k-row report explodes from the 1-row metrics frame — no "
            "join, no window, no second pass.",
            _expectations(spark, sf_dir),
        ),
        "lttb_downsample": (
            "LTTB serving decimation (r8): one Exchange by series "
            "key into FlatMapGroupsInPandas — the sequential-by-"
            "design bucket walk runs vectorized per series, series "
            "in parallel; nothing else in the plan.",
            _lttb(spark, sf_dir),
        ),
        "ohlc_bars": (
            "OHLC candles (r8 third arc): ONE map-side-combined hash "
            "aggregation on (key, bucket) — min_by/max_by carry "
            "(value, ordkey) pairs through partial aggregation, so "
            "there is no Window, no Sort, no Join anywhere; every "
            "output is a selection of an input double (bitwise "
            "partition-invariant with raw doubles).",
            _ohlc(spark, sf_dir),
        ),
        "mad_outliers": (
            "Robust seasonal outliers (r8 third arc): ONE Exchange on "
            "(key, hour-of-day) feeding TWO Window passes over the "
            "same clustering — the exact median, then the MAD over "
            "the median's output column; zero joins (the "
            "groupBy+join formulation would exchange three times).",
            _mad(spark, sf_dir),
        ),
        "priority_sample_global": (
            "Priority sampling (r8 third arc), global form: priority "
            "= w/u computed in the scan projection, then "
            "TakeOrderedAndProject keeps k+1 rows via distributed "
            "heap top-k — no global Sort, no global Window over the "
            "corpus; the threshold/estimator window runs over the "
            "k+1 survivors only.",
            _priority(spark, sf_dir),
        ),
        "scd2_diff": (
            "SCD2 change-data-capture read (r8 third arc): one "
            "dimension scan into one map-side-combined conditional "
            "aggregation on the key (max-when pulls each instant's "
            "single containing version; presence flags classify "
            "new/changed/unchanged) — no self-join, no window beyond "
            "the snapshot's own.",
            _scd2_diff(spark, sf_dir),
        ),
        "scd2_stream_write": (
            "Streaming SCD2 write path (r8, the lifted r7 weak flag): "
            "the store side is semi-joined to the batch's broadcast "
            "touched-key set BELOW the winner-rule window, so the "
            "window's key Exchange carries batch-proportional rows — "
            "the accumulated dimension never reshuffles per epoch "
            "(per-epoch seconds measured flat against 10x dimension "
            "growth, SCALE.md --scd2-stream; structural test at "
            "tests/test_streaming_scd2.py).",
            _scd2_stream_write(spark, sf_dir),
        ),
        "retention_matrix": (
            "Cohort retention (r8 single-pass rebuild, r7 verdict "
            "#2): ONE user-keyed hash aggregation (min for the cohort, "
            "collect_set for the distinct active periods) followed by "
            "an explode and a cohort-keyed count — no join anywhere "
            "and at most three Exchanges end to end (pinned in "
            "tests/test_cohorts.py); the pre-r8 form joined the "
            "cohort frame back onto events and re-exchanged the "
            "events-sized side.",
            _retention_matrix(spark, sf_dir),
        ),
        "attribution": (
            "Conversion attribution (r9): conversions explode into "
            "exactly TWO lookback-bucket probes and equi-join the "
            "touches on (user, bucket) — no unbounded range join; "
            "ONE window over conv_id carries n and the first/last "
            "composite-key picks; everything after is conversions x "
            "channels bounded.",
            _attribution(spark, sf_dir),
        ),
        "asof_attribution": (
            "Pair-free FULL attribution (r10): NO join anywhere — one "
            "user-keyed sort carries the per-channel running counts, "
            "the forward last-touch fill, and the REVERSED-order "
            "running fill standing in for first-touch (an unbounded-"
            "FOLLOWING frame would re-scan to partition end per row); "
            "then one conv-keyed aggregation over two marker rows per "
            "conversion and a channel-bounded explode.",
            _asof_attribution(spark, sf_dir),
        ),
        "funnel_trend": (
            "Per-anchor-period funnel (r10): the SAME one user-keyed "
            "exchange as the plain funnel (user_hits), then a "
            "(period x step)-bounded aggregation against the "
            "broadcast step frame — the trend view costs no extra "
            "data-wide work.",
            _funnel_trend(spark, sf_dir),
        ),
        "cap_events_per_key": (
            "Hot-key curation cap (r10): the salted two-stage "
            "keep-earliest-N — stage one partitions (key, type, "
            "hash-of-tie salt) so even a single bot key's sort splits "
            "across tasks, stage two ranks the <= salt x N survivors "
            "per group.",
            _cap_events(spark, sf_dir),
        ),
        "dedup_lines": (
            "Corpus-wide line dedup (r9): the line count is a "
            "map-side-combined hash aggregation (a boilerplate line "
            "collapses to one row per task BEFORE the exchange — no "
            "window keyed on the line anywhere), the dup set joins "
            "back (AQE broadcast-converts when it fits), and the "
            "rebuild is one per-doc aggregation.",
            _dedup_lines(spark, sf_dir),
        ),
        "topk_batch_summary": (
            "Heavy-hitters store write path (r9): one exact "
            "map-side-combined count, the group-keyed MG-trim "
            "windows, and the group-bounded sentinel full-outer — "
            "join-free of any store read (the store is never read on "
            "write).",
            _topk_summary(spark, sf_dir),
        ),
        "bpe_pair_counts": (
            "BPE training, the per-merge stage (r8 third arc): pair "
            "structs materialize BEFORE the explode (one tokenizer "
            "pass per word, the shingle/postings lesson), then ONE "
            "map-side-combined hash aggregation over the vocab-sized "
            "word table — the corpus never appears in the iteration "
            "plan at all.",
            _bpe_pairs(spark, sf_dir),
        ),
    }


def _time_decay(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.attribution import (
        time_decay_attribution,
    )

    return time_decay_attribution(
        load_table(spark, sf_dir, "events"),
        "purchase",
        ("view", "click"),
        lookback_seconds=86_400,
        half_life_seconds=3_600,
    )


def _ohlc(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.timeseries import ohlc_bars

    return ohlc_bars(load_table(spark, sf_dir, "events"))


def _mad(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.stats import mad_outliers

    return mad_outliers(load_table(spark, sf_dir, "events"))


def _priority(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.sampling import (
        priority_sample,
    )

    return priority_sample(
        load_table(spark, sf_dir, "events"), "event_id", "value", 100
    )


def _scd2_diff(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.scd2 import (
        scd2_diff,
        scd2_snapshot,
    )

    events = load_table(spark, sf_dir, "events")
    dim = scd2_snapshot(events, seq_col="event_id")
    lo, hi = events.selectExpr(
        "unix_micros(min(ts))", "unix_micros(max(ts))"
    ).first()
    return scd2_diff(dim, lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3)


def _scd2_stream_write(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.streaming.scd2 import Scd2Pipeline

    events = load_table(spark, sf_dir, "events")
    pipe = Scd2Pipeline(tempfile.mkdtemp(prefix="plans_scd2_"))
    pipe.write_batch(events.filter(F.col("event_id") % 3 == 0), epoch_id=0)
    pipe.write_batch(events.filter(F.col("event_id") % 3 == 1), epoch_id=1)
    batch = events.filter(F.col("event_id") % 3 == 2)
    touched = F.broadcast(batch.select(*pipe.keys).distinct())
    return pipe._winner_rows(
        pipe._raw_before(spark, 2).join(touched, pipe.keys, "semi")
    ).drop("epoch")


def _retention_matrix(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.cohorts import (
        retention_matrix,
    )

    return retention_matrix(
        load_table(spark, sf_dir, "events"), period_seconds=86_400
    )


def _attribution(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.attribution import (
        attribution,
    )

    return attribution(
        load_table(spark, sf_dir, "events"),
        "purchase",
        ("view", "click", "signup"),
        86_400,
    )


def _asof_attribution(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.attribution import (
        asof_attribution,
    )

    return asof_attribution(
        load_table(spark, sf_dir, "events"),
        "purchase",
        ("view", "click", "signup"),
        86_400,
    )


def _funnel_trend(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.funnel import funnel_trend

    return funnel_trend(
        load_table(spark, sf_dir, "events"),
        ["signup", "view", "click", "purchase"],
        86_400,
        horizon_seconds=7 * 86_400,
    )


def _cap_events(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.cleaning import (
        cap_events_per_key,
    )

    return cap_events_per_key(
        load_table(spark, sf_dir, "events"), 100, salt_partitions=8
    )


def _dedup_lines(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.cleaning import dedup_lines

    return dedup_lines(
        load_table(spark, sf_dir, "documents"), min_line_chars=1
    )


def _topk_summary(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.streaming.topk import TopKPipeline

    pipe = TopKPipeline(
        "/tmp/plans_topk_unused", ["event_type"], "user_id", m=64
    )
    return pipe._batch_summary(load_table(spark, sf_dir, "events"))


def _bpe_pairs(spark, sf_dir):
    from pyspark.sql import functions as F

    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.bpe import (
        _initial_symbols,
        _pair_rows,
        bpe_word_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = bpe_word_counts(docs).select(
        "w", "c", _initial_symbols().alias("syms")
    )
    return (
        _pair_rows(words).groupBy("a", "b").agg(F.sum("c").alias("cnt"))
    )


def _conversion_pairs(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.rangejoin import (
        conversion_pairs,
    )

    return conversion_pairs(load_table(spark, sf_dir, "events"))


def _hourly_rollup(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.agg import hourly_rollup

    return hourly_rollup(load_table(spark, sf_dir, "events"))


def _bm25(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "spark join merge window", k=10)


def _bm25_batch(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.retrieval import (
        retrieval_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [(1, "spark join merge window"), (2, "data pipeline quality")],
        "query_id BIGINT, query_text STRING",
    )
    return retrieval_decontaminate(docs, queries, k=10, min_score=0.5)


def _transitions(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.paths import (
        event_transitions,
    )

    return event_transitions(load_table(spark, sf_dir, "events"))


def _expectations(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.expectations import (
        events_expectations,
    )

    return events_expectations(load_table(spark, sf_dir, "events"))


def _lttb(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.downsample import lttb

    return lttb(load_table(spark, sf_dir, "events"), 500, key="user_id")


def _scd2_merge(spark, sf_dir):
    from pyspark.sql import functions as F

    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.scd2 import (
        scd2_merge,
        scd2_snapshot,
    )

    events = load_table(spark, sf_dir, "events")
    dim = scd2_snapshot(
        events, "user_id", ("event_type",), "ts", seq_col="event_id"
    ).localCheckpoint(eager=True)
    batch = events.filter(F.col("user_id") % 97 == 0)
    return scd2_merge(dim, batch, "user_id", ("event_type",), "ts")


def _time_weighted(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    return time_weighted_avg(load_table(spark, sf_dir, "events"))


def _substring_spans(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.substrings import (
        duplicated_spans,
    )

    return duplicated_spans(load_table(spark, sf_dir, "documents"), k=20)


def _subshard_candidates(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents")
    # default mode (auto) over salt-bearing band rows — the shape every
    # default minhash_lsh_pairs run takes since r6
    return dedup.candidate_pairs_from_bands(
        dedup.banded_rows(dedup.shingled_docs(docs), with_salt=True),
    )


def _capped_candidates(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.candidate_pairs_from_bands(
        dedup.banded_rows(dedup.shingled_docs(docs))
    )


def _near_dedup_probe(spark, sf_dir):
    from pyspark.sql import functions as F

    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions import dedup, incremental

    docs = load_table(spark, sf_dir, "documents")
    store_bands = dedup.banded_rows(
        dedup.shingled_docs(docs.filter(F.col("doc_id") < 2500))
    ).localCheckpoint(eager=True)
    batch_bands = dedup.banded_rows(
        dedup.shingled_docs(docs.filter(F.col("doc_id") >= 2500))
    )
    return incremental.store_candidates(store_bands, batch_bands)


def _ivf_exact(spark, sf_dir):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, 10, 5, n_centroids=16, n_probe=8)


def _bloom_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions import bloom

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 3500).select(
        F.col("text").alias("canon")
    ).distinct()
    batch = docs.filter(F.col("doc_id") >= 3000).select(
        "doc_id", F.col("text").alias("canon")
    )
    n_words = bloom.sketch_words_for_keys(4000)
    sketch = bloom.build_bloom_sketch(corpus, "canon", n_words)
    return bloom.incremental_dedup(batch, corpus, sketch, "canon", n_words)


def main() -> None:
    spark = build_session("dump-plans")
    qs = entrymod.queries()
    sf_dir = "/root/testdata/sf0.1"
    out = [
        "# PLANS — physical plans of the headline queries (sf0.1)",
        "",
        "Generated by `python tools/dump_plans.py`. Each plan is the",
        "adaptive physical plan Catalyst produces for the declarative",
        "DataFrame form — the annotations call out the property that",
        "matters at 100 TB.",
        "",
    ]
    shown = 0
    for name, note in SHOWCASE.items():
        plan = formatted_plan(qs[name](spark, sf_dir))
        out.append(f"## {name}")
        out.append("")
        out.append(note)
        out.append("")
        out.append("```")
        out.append(plan.strip())
        out.append("```")
        out.append("")
        shown += 1
    for name, (note, df) in _extras(spark, sf_dir).items():
        out.append(f"## {name} (library operator)")
        out.append("")
        out.append(note)
        out.append("")
        out.append("```")
        out.append(formatted_plan(df).strip())
        out.append("```")
        out.append("")
        shown += 1
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({shown} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
