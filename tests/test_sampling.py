"""Deterministic sampling/splitting (functions/sampling.py).

No DuckDB twin exists for xxhash64, so these are invariant tests: the
properties a reproducible sampler must satisfy (determinism under
re-execution and repartitioning, disjoint/exhaustive splits, rate
accuracy, nested-subset monotonicity) rather than a value-for-value
oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.functions.sampling import (
    deterministic_sample,
    hash_split,
    per_group_cap,
    weighted_mixture,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_hash_split_partitions_corpus(spark, docs):
    split = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive (and disjoint: one col)
    assert set(counts) == {"train", "val", "test"}
    # proportions within sampling noise for 500 docs
    assert abs(counts["train"] / n - 0.8) < 0.06
    assert abs(counts["val"] / n - 0.1) < 0.05


def test_hash_split_deterministic_and_partition_invariant(spark, docs):
    w = {"a": 0.5, "b": 0.5}
    one = {(r["doc_id"], r["split"])
           for r in hash_split(docs, "doc_id", w).collect()}
    two = {(r["doc_id"], r["split"])
           for r in hash_split(docs.repartition(7), "doc_id", w).collect()}
    assert one == two


def test_hash_split_seed_changes_assignment(spark, docs):
    w = {"a": 0.5, "b": 0.5}
    one = {(r["doc_id"], r["split"])
           for r in hash_split(docs, "doc_id", w, seed=0).collect()}
    two = {(r["doc_id"], r["split"])
           for r in hash_split(docs, "doc_id", w, seed=1).collect()}
    assert one != two


def test_sample_rates_and_edges(spark, docs):
    n = docs.count()
    assert deterministic_sample(docs, 1.0, "doc_id").count() == n
    assert deterministic_sample(docs, 0.0, "doc_id").count() == 0
    got = deterministic_sample(docs, 0.3, "doc_id").count()
    assert abs(got / n - 0.3) < 0.07


def test_sample_nested_subsets(spark, docs):
    """Same seed, larger rate => strict superset (threshold
    monotonicity) — lets a pipeline grow a sample without resampling."""
    small, big = (ids(deterministic_sample(docs, r, "doc_id")) for r in (0.2, 0.5))
    assert small <= big


def test_sample_partition_invariant(spark, docs):
    assert ids(deterministic_sample(docs, 0.4, "doc_id")) == ids(
        deterministic_sample(docs.repartition(11), 0.4, "doc_id")
    )


def test_per_group_cap_enforces_quota(spark, docs):
    capped = per_group_cap(docs, ["lang", "source"], cap=5, key="doc_id")
    sizes = capped.groupBy("lang", "source").agg(F.count("*").alias("n"))
    assert sizes.filter(F.col("n") > 5).count() == 0
    # groups smaller than the cap are untouched
    before = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    small = before.filter(F.col("n") <= 5).count()
    assert sizes.filter(F.col("n") <= 5).count() >= small


def test_per_group_cap_deterministic(spark, docs):
    a = ids(per_group_cap(docs, ["lang"], cap=10, key="doc_id"))
    b = ids(per_group_cap(docs.repartition(13), ["lang"], cap=10, key="doc_id"))
    assert a == b


def test_per_group_cap_order_by_quality(spark, docs):
    by_len = per_group_cap(
        docs, ["lang"], cap=3, order_by=F.col("n_chars").desc()
    )
    # survivors are each lang's 3 longest documents
    top = docs.withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.col("n_chars").desc())
        ),
    ).filter(F.col("_r") <= 3)
    assert ids(by_len) == ids(top)


def test_per_group_cap_requires_ordering(spark, docs):
    with pytest.raises(ValueError, match="order_by .* or key"):
        per_group_cap(docs, ["lang"], cap=3)


def test_weighted_mixture_rates(spark, docs):
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    keep_all, keep_some = sources[0], sources[1]
    mixed = weighted_mixture(
        docs, "source", {keep_all: 1.0, keep_some: 0.25}, key="doc_id"
    )
    per = {r["source"]: r["n"] for r in
           mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per[keep_all] == full[keep_all]
    assert abs(per.get(keep_some, 0) / full[keep_some] - 0.25) < 0.12
    # unlisted sources default to rate 0 -> absent
    assert set(per) == {keep_all, keep_some}


def test_weighted_mixture_narrow_plan(spark, docs):
    plan = weighted_mixture(
        docs, "source", {"web": 0.5}, key="doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # single narrow filter over the scan


def test_deterministic_sample_streams_identically(spark, tmp_path):
    """The hash predicate is stateless, so the same sampler expression
    runs unchanged on a streaming frame — and because membership is a
    pure function of the key, the streamed sample equals the batch
    sample bitwise (DataFrame.sample could never promise this: its
    membership depends on partition layout and evaluation order)."""
    import os

    from cassandra_iot_pipeline_spark.functions.sampling import (
        deterministic_sample,
    )
    from cassandra_iot_pipeline_spark.streaming.pipeline import (
        read_event_stream,
    )
    from cassandra_iot_pipeline_spark.streaming.sinks import ParquetUpsertSink
    from cassandra_iot_pipeline_spark.streaming.staging import (
        stage_events_stream,
    )
    from tests.conftest import SF_DIR

    staged = stage_events_stream(spark, SF_DIR)
    sink = ParquetUpsertSink(str(tmp_path / "sampled"), pk=("event_id",))
    q = (
        deterministic_sample(
            read_event_stream(spark, staged, max_files_per_trigger=16),
            rate=0.25,
            key="event_id",
        )
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    events = load_table(spark, SF_DIR, "events")
    want = sorted(
        r.event_id
        for r in deterministic_sample(events, 0.25, "event_id").collect()
    )
    got = sorted(r.event_id for r in sink.read(spark).collect())
    assert got == want and 0 < len(got) < events.count()


def test_mixture_rates_plans_the_mixture(spark):
    """mixture_rates solves per-source rates for a target composition:
    exact allocation arithmetic, saturation capped at 1.0 with the
    shortfall REPORTED (never silently reshuffled), the no-budget form
    maxing the corpus without repeating data — and the rates feed
    weighted_mixture to land within sampling tolerance of the target
    mix."""
    from cassandra_iot_pipeline_spark.functions.sampling import (
        mixture_rates,
    )

    rows = (
        [(i, "web", 100) for i in range(4_000)]
        + [(i + 10_000, "code", 100) for i in range(1_000)]
        + [(i + 20_000, "books", 100) for i in range(500)]
        + [(i + 30_000, "junk", 100) for i in range(100)]
    )
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, source STRING, n_tokens BIGINT"
    )
    shares = {"web": 0.5, "code": 0.3, "books": 0.2}

    # explicit budget, nothing saturates: allocation == budget * share
    plan = mixture_rates(df, "source", shares, "n_tokens", budget=200_000)
    assert plan["available"] == {
        "web": 400_000.0, "code": 100_000.0, "books": 50_000.0,
    }
    assert plan["rates"]["web"] == 100_000 / 400_000
    assert plan["rates"]["code"] == 60_000 / 100_000
    assert plan["rates"]["books"] == 40_000 / 50_000
    assert plan["shortfall"] == {}

    # budget beyond a source's supply: cap at 1.0, report the gap
    plan = mixture_rates(df, "source", shares, "n_tokens", budget=300_000)
    assert plan["rates"]["books"] == 1.0
    assert plan["shortfall"] == {"books": 10_000.0}
    assert plan["allocated"]["books"] == 50_000.0

    # no budget: the binding source (books: 50k/0.2 = 250k) sets it
    plan = mixture_rates(df, "source", shares, "n_tokens")
    assert plan["budget"] == 250_000.0
    assert plan["rates"]["books"] == 1.0 and plan["shortfall"] == {}

    # executed through weighted_mixture, the realized composition is
    # the target within hash-sampling noise (sources not in the plan
    # drop out via default_rate=0)
    sampled = weighted_mixture(
        df, "source", plan["rates"], key="doc_id"
    )
    got = {
        r["source"]: r["t"]
        for r in sampled.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert "junk" not in got
    assert got["books"] == 50_000  # rate 1.0 is exact, not sampled
    for s in ("web", "code"):
        assert abs(got[s] - plan["allocated"][s]) / plan["allocated"][s] < 0.15

    # zero-supply source with a positive share fails loudly
    with pytest.raises(ValueError, match="zero-supply"):
        mixture_rates(df, "source", {"web": 0.5, "ghost": 0.5}, "n_tokens")


def test_mixture_rates_zero_share_sources(spark):
    """r7 ADVICE: a zero-valued target share gets rate 0.0 and is
    excluded from BOTH the zero-supply guard and the budget=None min
    (it used to ZeroDivisionError); a zero-share source with no rows
    at all is equally fine — it asks for nothing."""
    from cassandra_iot_pipeline_spark.functions.sampling import (
        mixture_rates,
        weighted_mixture,
    )

    rows = (
        [(i, "web", 100) for i in range(1_000)]
        + [(i + 10_000, "code", 100) for i in range(500)]
    )
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, source STRING, n_tokens BIGINT"
    )
    # zero share on a PRESENT source + zero share on an ABSENT source
    shares = {"web": 0.8, "code": 0.2, "books": 0.0, "ghost": 0.0}
    plan = mixture_rates(df, "source", shares, "n_tokens")  # budget=None
    assert plan["rates"]["books"] == 0.0 and plan["rates"]["ghost"] == 0.0
    assert plan["allocated"]["books"] == 0.0
    assert "books" not in plan["available"]
    assert plan["shortfall"] == {}
    # budget set only by the positive shares: web binds (100k/0.8)
    assert plan["budget"] == 125_000.0
    assert plan["rates"]["web"] == 1.0
    assert plan["rates"]["code"] == 25_000 / 50_000
    # executing the plan keeps zero-share sources out
    sampled = weighted_mixture(df, "source", plan["rates"], key="doc_id")
    assert sampled.filter(F.col("source") == "books").count() == 0
    # negative shares stay loud
    with pytest.raises(ValueError, match=">= 0"):
        mixture_rates(df, "source", {"web": 1.0, "code": -0.1}, "n_tokens")


def test_top_fraction_by_score(spark, duck):
    """Percentile-threshold selection (FineWeb-style 'top X% by
    quality'): the discrete threshold matches DuckDB bitwise at both
    the global and per-group grain, boundary ties are all kept, NULL
    scores never are, and the kept set is exactly score >= threshold."""
    from cassandra_iot_pipeline_spark.functions.sampling import (
        score_thresholds,
        score_thresholds_oracle,
        top_fraction_by_score,
    )
    from cassandra_iot_pipeline_spark.catalog import load_table
    from tests.conftest import SF_DIR
    from tools.oracle_check import compare

    docs = load_table(spark, SF_DIR, "documents")
    for groups in ((), ("lang",)):
        spark_pdf = score_thresholds(
            docs, "n_chars", 0.1, groups
        ).toPandas()
        oracle_pdf = duck.sql(
            score_thresholds_oracle("documents", "n_chars", 0.1, groups)
        ).df()
        assert compare(spark_pdf, oracle_pdf) == [], groups

    # hand case with boundary ties and a NULL
    rows = [(i, float(s)) for i, s in enumerate([1, 2, 3, 3, 3, 4, 9, 9, 5, 6])]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "doc_id BIGINT, q DOUBLE")
    thr = score_thresholds(df, "q", 0.3).collect()[0]
    # n=10 scored rows, k=ceil(3)=3 -> 3rd highest is 6.0
    assert (thr["n_rows"], thr["k_target"], thr["threshold"]) == (10, 3, 6.0)
    kept = top_fraction_by_score(df, "q", 0.3)
    assert sorted(r["q"] for r in kept.collect()) == [6.0, 9.0, 9.0]
    # tie inflation: threshold landing ON the 3.0 run keeps all of it
    thr2 = score_thresholds(df, "q", 0.7).collect()[0]
    assert thr2["k_target"] == 7 and thr2["threshold"] == 3.0
    assert top_fraction_by_score(df, "q", 0.7).count() == 8  # 3 ties kept
    # frac=1.0 keeps every scored row, never the NULL
    assert top_fraction_by_score(df, "q", 1.0).count() == 10
    with pytest.raises(ValueError, match="keep_frac"):
        top_fraction_by_score(df, "q", 0.0)


def test_top_fraction_plan_shape(spark):
    """Value-collapse rule: the threshold side aggregates distinct
    (group, score) rows before its window (no task ever sorts raw
    rows), and the corpus-side filter join is a broadcast — the
    corpus never shuffles."""
    from cassandra_iot_pipeline_spark.functions.sampling import (
        top_fraction_by_score,
    )
    from cassandra_iot_pipeline_spark.catalog import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    df = top_fraction_by_score(docs, "n_chars", 0.25, ("lang",))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    # the window sits above a HashAggregate (the value collapse), and
    # the corpus scan feeds the join probe directly (no exchange on
    # the probe side beyond the scan)
    assert final.index("Window") > final.index("BroadcastHashJoin")


def test_score_thresholds_quantized_grid(spark, duck):
    """Continuous-score mode: quantize_decimals floors scores onto a
    bounded grid for the threshold (oracle parity), and the resulting
    cut keeps AT LEAST the exact mode's target (one-sided, at most a
    grid cell wider)."""
    from cassandra_iot_pipeline_spark.functions.sampling import (
        score_thresholds,
        score_thresholds_oracle,
        top_fraction_by_score,
    )
    from tools.oracle_check import compare

    rows = [(i, 1.0 / (i + 3)) for i in range(500)]  # continuous scores
    df = spark.createDataFrame(rows, "doc_id BIGINT, q DOUBLE")
    df.toPandas().pipe(lambda pdf: duck.register("_q_cont", pdf))
    for d in (2, 6):
        spark_pdf = score_thresholds(
            df, "q", 0.1, quantize_decimals=d
        ).toPandas()
        oracle_pdf = duck.sql(
            score_thresholds_oracle("_q_cont", "q", 0.1, quantize_decimals=d)
        ).df()
        assert compare(spark_pdf, oracle_pdf) == [], d
    exact_kept = top_fraction_by_score(df, "q", 0.1).count()
    for d in (6, 2):
        q_kept = top_fraction_by_score(df, "q", 0.1, quantize_decimals=d)
        assert q_kept.count() >= exact_kept  # never under-keeps
    # coarse grid inflates, fine grid converges to exact here
    assert top_fraction_by_score(df, "q", 0.1, quantize_decimals=6).count() == exact_kept


def test_temperature_shares_hand_computed(spark):
    """q_i ∝ p_i^(1/tau): hand-computed flattening, tau=1 identity,
    large tau → near uniform, guards, and composition with
    mixture_rates (the flattened shares plan a realizable mix)."""
    from cassandra_iot_pipeline_spark.functions.sampling import (
        mixture_rates,
        temperature_shares,
    )

    rows = [("web", 80.0), ("code", 15.0), ("books", 5.0)]
    df = spark.createDataFrame(
        [(s, w, i) for i, (s, w) in enumerate(rows)],
        "source STRING, w DOUBLE, doc_id BIGINT",
    )
    out = temperature_shares(df, "source", tau=2.0, weight_col="w")
    assert out["observed"] == {"web": 0.8, "code": 0.15, "books": 0.05}
    import math

    z = sum(math.sqrt(p) for p in (0.8, 0.15, 0.05))
    for s, p in out["observed"].items():
        assert abs(out["shares"][s] - math.sqrt(p) / z) < 1e-12
    # flattening: rare sources gain share, dominant loses
    assert out["shares"]["books"] > 0.05
    assert out["shares"]["web"] < 0.8

    ident = temperature_shares(df, "source", tau=1.0, weight_col="w")
    for s in ident["shares"]:
        assert abs(ident["shares"][s] - ident["observed"][s]) < 1e-12

    flat = temperature_shares(df, "source", tau=1e9, weight_col="w")
    assert all(abs(v - 1 / 3) < 1e-6 for v in flat["shares"].values())

    with pytest.raises(ValueError, match="tau"):
        temperature_shares(df, "source", tau=0.0)

    plan = mixture_rates(
        df, "source", out["shares"], weight_col="w"
    )
    # the binding source is the rarest (largest share gain): its rate
    # is 1.0 and every allocation realizes the temperature shares
    assert plan["rates"]["books"] == 1.0
    total = sum(plan["allocated"].values())
    for s, q in out["shares"].items():
        assert abs(plan["allocated"][s] / total - q) < 1e-9
