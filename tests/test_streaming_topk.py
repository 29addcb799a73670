"""Continuously-maintained heavy hitters (streaming/topk.py): the
exact regime (no trim ever fires) is bitwise DuckDB-parity with a
plain groupBy over the concatenated batches; past m the one-sided
Misra-Gries contract holds (n_lo <= true <= n_hi, err <= N/(m+1),
every above-threshold token present); replay idempotence; compaction
is contract-invisible and bounds the base at m + 1 rows per group;
and the foreachBatch wiring runs end-to-end."""

from __future__ import annotations

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.streaming.topk import (
    TopKPipeline,
    streaming_topk,
)
from tests.conftest import SF_DIR
from tools.oracle_check import compare

SCHEMA = "g STRING, t STRING"


def _frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


# three batches over two groups; group 'a' has a persistent heavy
# token 'hot' plus a churning tail, group 'b' stays tiny
BATCHES = [
    [("a", "hot")] * 5 + [("a", f"t{i}") for i in range(4)] + [("b", "x")],
    [("a", "hot")] * 6 + [("a", f"t{i}") for i in range(2, 7)] + [("b", "y")],
    [("a", "hot")] * 4 + [("a", f"u{i}") for i in range(4)] + [("b", "x")],
]


def _true_counts():
    c: Counter = Counter()
    for b in BATCHES:
        c.update(b)
    return c


def _run(spark, tmp_path, m, compact_every=None):
    pipe = TopKPipeline(
        str(tmp_path / "s"),
        group_cols=["g"],
        token_col="t",
        m=m,
        compact_every=compact_every,
        updates_schema=SCHEMA,
    )
    for i, rows in enumerate(BATCHES):
        pipe.write_batch(_frame(spark, rows), epoch_id=i)
    return pipe


def test_exact_regime_is_duckdb_parity(spark, tmp_path, duck):
    """m large enough that no trim fires: the summary IS the exact
    frequency table — bitwise equal to DuckDB's groupBy, n_lo == n_hi,
    err == 0."""
    pipe = _run(spark, tmp_path, m=100, compact_every=2)
    all_rows = [r for b in BATCHES for r in b]
    duck.execute("DROP TABLE IF EXISTS topk_src")
    duck.execute("CREATE TABLE topk_src (g VARCHAR, t VARCHAR)")
    duck.executemany("INSERT INTO topk_src VALUES (?, ?)", all_rows)
    want = duck.sql(
        """
        SELECT g, t AS token, COUNT(*) AS n_lo, COUNT(*) AS n_hi
        FROM topk_src GROUP BY g, t
        """
    ).df()
    got = pipe.summary(spark).toPandas()
    assert compare(got, want) == []
    errs = {r["g"]: r["err"] for r in pipe.errors(spark).collect()}
    assert set(errs.values()) == {0}


def test_bounded_regime_contract(spark, tmp_path):
    """m = 3 forces trims in group 'a': every surviving counter
    brackets its true count, err <= N_a/(m+1), and the heavy token is
    present with the top n_lo."""
    m = 3
    pipe = _run(spark, tmp_path, m=m)
    true = _true_counts()
    n_a = sum(v for (g, _), v in true.items() if g == "a")
    errs = {r["g"]: r["err"] for r in pipe.errors(spark).collect()}
    assert 0 < errs["a"] <= n_a / (m + 1)
    assert errs["b"] == 0  # never exceeded m distinct
    rows = {
        (r["g"], r["token"]): (r["n_lo"], r["n_hi"])
        for r in pipe.summary(spark).collect()
    }
    for (g, tok), (lo, hi) in rows.items():
        assert lo <= true[(g, tok)] <= hi, (g, tok)
    # the presence guarantee: every token with true count > err survives
    for (g, tok), n in true.items():
        if n > errs[g]:
            assert (g, tok) in rows, (g, tok, n)
    top = pipe.topk(spark, k=1).collect()
    assert {(r["g"], r["token"]) for r in top} >= {("a", "hot")}


def test_replay_is_idempotent(spark, tmp_path):
    pipe = _run(spark, tmp_path, m=3)
    before = sorted(tuple(r) for r in pipe.summary(spark).collect())
    pipe.write_batch(_frame(spark, BATCHES[1]), epoch_id=1)  # replay
    assert sorted(tuple(r) for r in pipe.summary(spark).collect()) == before


def test_compaction_contract_invisible_and_bounded(spark, tmp_path):
    """Compaction may tighten/widen within the contract but never
    violates it: bounds still bracket every true count, the heavy
    token stays on top, and the base holds <= m + 1 rows per group."""
    m = 3
    pipe = _run(spark, tmp_path, m=m)
    true = _true_counts()
    assert pipe.compact(spark) == 2
    errs = {r["g"]: r["err"] for r in pipe.errors(spark).collect()}
    n_a = sum(v for (g, _), v in true.items() if g == "a")
    assert errs["a"] <= n_a / (m + 1)
    rows = {
        (r["g"], r["token"]): (r["n_lo"], r["n_hi"])
        for r in pipe.summary(spark).collect()
    }
    for (g, tok), (lo, hi) in rows.items():
        assert lo <= true[(g, tok)] <= hi, (g, tok)
    for (g, tok), n in true.items():
        if n > errs[g]:
            assert (g, tok) in rows, (g, tok)
    top = pipe.topk(spark, k=1).collect()
    assert {(r["g"], r["token"]) for r in top} >= {("a", "hot")}
    # base boundedness: at most m token rows + 1 sentinel per group
    base = spark.read.parquet(f"{pipe.mg_dir}/base_upto=2")
    per_group = {
        r["g"]: r["n"]
        for r in base.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n <= m + 1 for n in per_group.values()), per_group


def test_fixture_events_topk(spark, tmp_path):
    """Fixture end-to-end: per-event-type top users from the store
    equal the exact top users when m exceeds the fixture's user count
    (exact regime), through the real foreachBatch wiring."""
    events = load_table(spark, SF_DIR, "events")
    staged = str(tmp_path / "staged")
    n = events.count()
    pdf = events.orderBy("event_id").toPandas()
    third = max(1, n // 3)
    os.makedirs(staged)
    for i in range(3):
        chunk = pdf.iloc[i * third : (i + 1) * third if i < 2 else n]
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            f"{staged}/{i:04d}.parquet",
            # fixture ts arrives as datetime64[ns]; Spark's reader
            # needs a micros-annotated column
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    q = streaming_topk(
        spark,
        staged,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        group_cols=["event_type"],
        token_col="user_id",
        m=1000,
        # no trigger passed: the family-convention default must be
        # availableNow (drain and stop) — a hang here is the bug
    )
    q.awaitTermination()
    pipe = TopKPipeline(
        str(tmp_path / "store"), ["event_type"], "user_id", m=1000
    )
    got = {
        (r["event_type"], r["token"]): r["n_lo"]
        for r in pipe.topk(spark, k=3).collect()
    }
    want_rows = (
        events.groupBy("event_type", F.col("user_id").cast("string").alias("token"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.desc("n"), F.asc("token")
                )
            ),
        )
        .filter(F.col("rk") <= 3)
        .collect()
    )
    want = {(r["event_type"], r["token"]): r["n"] for r in want_rows}
    assert got == want


def test_write_path_plan_shape(spark):
    """The per-epoch summary is join-free: one map-side-combined exact
    count exchange plus the group-keyed trim windows — batch-local
    work only (the store is never read on write)."""
    from cassandra_iot_pipeline_spark.plans import formatted_plan

    import re

    pipe = TopKPipeline("/tmp/unused_topk", ["g"], "t", m=4)
    df = pipe._batch_summary(_frame(spark, BATCHES[0]))
    plan = formatted_plan(df)
    # the only join permitted is the sentinel full-outer over the two
    # GROUP-bounded side frames; no store read, no scan beyond the batch
    # formatted plans name each node in the tree AND the detail
    # section — count tree nodes (the "Join <type> (id)" form)
    joins = re.findall(r"Join \w+ \(\d+\)", plan)
    assert len(joins) <= 1 and all("FullOuter" in j for j in joins), joins
    assert "parquet" not in plan.lower()
