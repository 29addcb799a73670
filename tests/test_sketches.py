"""Count-Min sketch: the CM guarantee (never underestimates), error
bound, mergeability, and bitwise DuckDB parity of sketch + estimates."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table, table_path
from cassandra_iot_pipeline_spark.functions.sketches import (
    cm_estimate,
    cm_sketch,
)
from cassandra_iot_pipeline_spark.functions.text import _oracle_tokens, tokens
from tests.conftest import SF_DIR


def _token_rows(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return docs.select(F.explode(tokens(F.col("text"))).alias("t"))


def test_cm_never_underestimates_and_bounds_error(spark):
    toks = _token_rows(spark)
    sketch = cm_sketch(toks)
    est = cm_estimate(toks, sketch)
    exact = toks.groupBy(F.col("t").alias("token")).agg(
        F.count(F.lit(1)).alias("n")
    )
    joined = est.join(exact, "token").collect()
    assert joined, "no tokens"
    total = sum(r.n for r in joined)
    for r in joined:
        assert r.est >= r.n, (r.token, r.est, r.n)  # CM guarantee
    # expected overestimate per counter ~ total/width; allow 10x slack
    slack = 10 * total / 1024
    bad = [r for r in joined if r.est - r.n > slack]
    assert len(bad) <= max(1, len(joined) // 20), bad[:5]


def test_cm_sketches_merge_by_addition(spark):
    """sketch(A) + sketch(B) folded per counter == sketch(A ∪ B): the
    property that lets each landed batch ship its own tiny sketch. The
    split is by row number so token multiplicity is preserved."""
    toks = _token_rows(spark)
    from pyspark.sql.window import Window

    numbered = toks.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
    )
    first = numbered.filter(F.col("rn") <= 2000).drop("rn")
    rest = numbered.filter(F.col("rn") > 2000).drop("rn")
    merged = (
        cm_sketch(first)
        .unionByName(cm_sketch(rest))
        .groupBy("j", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    whole = cm_sketch(toks)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cm_bitwise_duckdb_parity(spark):
    toks = _token_rows(spark)
    est = cm_estimate(toks, cm_sketch(toks)).toPandas().set_index("token").sort_index()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{table_path(SF_DIR, 'documents')}')"
    )
    hex2int = (
        "list_sum(list_transform(range(0, 8), i -> "
        "CAST(strpos('0123456789abcdef', "
        "substr(hx, CAST(1 + j * 8 + i AS INT), 1)) - 1 AS BIGINT) "
        "<< CAST((7 - i) * 4 AS INT)))"
    )
    q = f"""
        WITH tok AS (
            SELECT unnest({_oracle_tokens('text')}) AS t FROM documents
        ),
        th AS (SELECT t, sha256(t) AS hx FROM tok),
        probes AS (
            SELECT t, j.j, ({hex2int}) % 1024 AS bucket
            FROM th, range(0, 4) j(j)
        ),
        sketch AS (
            SELECT j, bucket, COUNT(*) AS c FROM probes GROUP BY j, bucket
        ),
        qprobes AS (
            SELECT DISTINCT t AS token, j, bucket FROM probes
        )
        SELECT token, MIN(COALESCE(c, 0)) AS est
        FROM qprobes LEFT JOIN sketch USING (j, bucket)
        GROUP BY token
    """
    want = con.execute(q).fetchdf().set_index("token").sort_index()
    assert list(est.index) == list(want.index)
    assert (est.est == want.est).all()


# --- exact heavy hitters (CMS-routed) ----------------------------------------


def _brute_frequent(duck, phi):
    from cassandra_iot_pipeline_spark.functions.sketches import (
        frequent_tokens_oracle,
    )

    return {
        (r[0], int(r[1]))
        for r in duck.execute(frequent_tokens_oracle(phi)).fetchall()
    }


def test_frequent_tokens_exact_vs_duckdb(spark, duck):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.sketches import frequent_tokens
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r.token, r.n_occurrences)
        for r in frequent_tokens(docs, phi=0.002).collect()
    }
    assert got == _brute_frequent(duck, 0.002)
    assert got  # fixture has tokens above the bar — a real comparison


def test_frequent_tokens_exact_for_every_geometry(spark, duck):
    """CMS overestimates only, so the routed result is bit-identical to
    brute force for ANY width/depth — including a deliberately tiny,
    collision-heavy sketch where nearly everything becomes a candidate
    (correctness never depends on sketch tuning, only the sliver size
    does)."""
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.sketches import frequent_tokens
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    expect = _brute_frequent(duck, 0.003)
    for width, depth in ((8, 1), (64, 2), (2048, 4)):
        got = {
            (r.token, r.n_occurrences)
            for r in frequent_tokens(
                docs, phi=0.003, width=width, depth=depth
            ).collect()
        }
        assert got == expect, f"width={width} depth={depth}"


def test_frequent_tokens_single_exchange(spark):
    """The routing is map-side: one Exchange total (the exact groupBy
    over the candidate sliver) — the full token population never
    shuffles."""
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.sketches import frequent_tokens
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        frequent_tokens(docs, phi=0.002)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_frequent_tokens_rejects_bad_phi(spark):
    from cassandra_iot_pipeline_spark.catalog import load_table
    from cassandra_iot_pipeline_spark.functions.sketches import frequent_tokens
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="phi"):
            frequent_tokens(docs, phi=bad)


def test_frequent_tokens_family_independent(spark):
    """The exact heavy-hitter output cannot depend on the routing
    sketch's hash family: the fast xxhash64 family (default) and the
    portable sha256 family route different candidate slivers, but the
    exact filter lands on identical results."""
    from cassandra_iot_pipeline_spark.functions.sketches import frequent_tokens

    docs = load_table(spark, SF_DIR, "documents")
    fast = sorted(map(tuple, frequent_tokens(docs, 0.02).collect()))
    portable = sorted(
        map(tuple, frequent_tokens(docs, 0.02, portable=True).collect())
    )
    assert fast == portable and len(fast) > 0
