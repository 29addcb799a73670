"""Sketches, schema-registry client, Kafka builder structure."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.stats import approx_user_count
from cassandra_iot_pipeline_spark.schemas import SENSOR_EVENT_AVRO
from cassandra_iot_pipeline_spark.sources.kafka import kafka_source_options
from cassandra_iot_pipeline_spark.sources.registry import (
    check_backward_compatible,
    fetch_latest_schema,
    sensor_event_schema,
)
from tests.conftest import SF_DIR


def test_approx_count_within_rsd(spark):
    events = load_table(spark, SF_DIR, "events")
    row = approx_user_count(events, rsd=0.05).head()
    assert abs(row.approx_users - row.exact_users) <= max(
        3, 0.15 * row.exact_users
    ), f"HLL estimate {row.approx_users} too far from {row.exact_users}"


def test_kmv_exact_branch_below_k(spark):
    """Fewer distinct users than k: the sketch holds the whole universe
    and the estimate IS the exact count (the CASE n < k branch)."""
    from cassandra_iot_pipeline_spark.operators.stats import kmv_user_count

    events = load_table(spark, SF_DIR, "events")
    row = kmv_user_count(events).head()
    assert row.kmv_users == float(row.exact_users)


def test_kmv_sketch_branch_accuracy(spark):
    """Above k distinct users the (k-1)/h_(k) estimator engages; with
    k=256 the expected relative error is ~6%, so 20% is a safe pin."""
    from pyspark.sql import functions as F

    from cassandra_iot_pipeline_spark.operators.stats import kmv_user_count

    n_users = 5000
    events = spark.range(n_users * 4).select(
        (F.col("id") % n_users).alias("user_id")
    )
    row = kmv_user_count(events).head()
    assert row.exact_users == n_users
    assert row.kmv_users != float(n_users)  # genuinely the sketch branch
    assert abs(row.kmv_users - n_users) < 0.2 * n_users, row.kmv_users


def test_kmv_partition_invariance(spark):
    """The estimate depends only on the distinct-hash set, never on the
    physical layout — repartitioning must not move a single bit."""
    from pyspark.sql import functions as F

    from cassandra_iot_pipeline_spark.operators.stats import kmv_user_count

    events = spark.range(2000 * 3).select((F.col("id") % 2000).alias("user_id"))
    a = kmv_user_count(events).head()
    b = kmv_user_count(events.repartition(17)).head()
    assert (a.exact_users, a.kmv_users) == (b.exact_users, b.kmv_users)


def test_quantile_tiers(spark, duck):
    """Three quantile tiers: exact (oracle-checked in the registry),
    engine sketch (accuracy vs exact), portable sample (bitwise DuckDB
    parity — approximate yet reproducible)."""
    from cassandra_iot_pipeline_spark.operators.stats import (
        sampled_quantiles,
        sampled_quantiles_oracle,
        value_quantiles,
        value_quantiles_approx,
    )
    from tools.oracle_check import compare

    events = load_table(spark, SF_DIR, "events")
    exact = {r.event_type: r for r in value_quantiles(events).collect()}

    approx = {r.event_type: r for r in value_quantiles_approx(events).collect()}
    for et, e in exact.items():
        a = approx[et]
        for q in ("p25", "p50", "p75"):
            # high-accuracy sketch on a small group: near-exact
            assert abs(getattr(a, q) - getattr(e, q)) <= max(
                0.5, 0.02 * abs(getattr(e, q))
            ), (et, q, a, e)

    got = sampled_quantiles(events).toPandas()
    want = duck.execute(sampled_quantiles_oracle()).fetchdf()
    assert not compare(got, want)
    # sample covers the whole fixture (n < k per type) -> equals exact
    sampled = {r.event_type: r for r in sampled_quantiles(events).collect()}
    bigger = {
        r.event_type: r for r in sampled_quantiles(events, k=10**9).collect()
    }
    for et in exact:
        assert tuple(sampled[et]) == tuple(bigger[et])


def test_sampled_quantiles_prefilter_is_a_pure_prune(spark):
    """prefilter_rate only prunes the window's input: at rate 1.0 the
    threshold admits every hash, so the result is bit-identical to the
    unfiltered form (the >= k sizing contract is the caller's dial)."""
    from cassandra_iot_pipeline_spark.operators.stats import sampled_quantiles

    events = load_table(spark, SF_DIR, "events")
    a = sorted(map(tuple, sampled_quantiles(events).collect()))
    b = sorted(
        map(tuple, sampled_quantiles(events, prefilter_rate=1.0).collect())
    )
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampled_quantiles(events, prefilter_rate=0.0)


def test_value_moments_singleton_group_is_null_not_nan(spark):
    """One-row groups have no sample variance: NULL like stddev_samp,
    never the raw formula's 0.0/0.0 NaN."""
    from cassandra_iot_pipeline_spark.operators.stats import value_moments

    from pyspark.sql import functions as F

    one = spark.createDataFrame([("solo", 3.5)], "event_type string, value double")
    row = value_moments(one).head()
    assert row.n == 1 and row.mean_value == 3.5
    assert row.var_value is None and row.stddev_value is None


def test_value_moments_bitwise_parity_and_invariance(spark, duck):
    """Exact integer second moments: bitwise equal to DuckDB (unlike
    Welford-based stddev_samp) and invariant under repartitioning."""
    from cassandra_iot_pipeline_spark.operators.stats import (
        value_moments,
        value_moments_oracle,
    )
    from tools.oracle_check import compare

    events = load_table(spark, SF_DIR, "events")
    got = value_moments(events).toPandas()
    want = duck.execute(value_moments_oracle()).fetchdf()
    assert not compare(got, want)
    a = sorted(map(tuple, value_moments(events).collect()))
    b = sorted(map(tuple, value_moments(events.repartition(11)).collect()))
    assert a == b


def test_registry_fetch_and_fallback():
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps({"schema": SENSOR_EVENT_AVRO, "id": 1}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_port}"
        got = fetch_latest_schema(url, "sensor-events-value")
        assert json.loads(got)["name"] == "SensorEvent"
        # plan-time caching: second call hits the lru_cache
        assert fetch_latest_schema(url, "sensor-events-value") is got
    finally:
        server.shutdown()
    # offline fallback returns the vendored contract
    assert sensor_event_schema("http://127.0.0.1:1") == SENSOR_EVENT_AVRO
    assert sensor_event_schema(None) == SENSOR_EVENT_AVRO


def test_backward_compatibility_check():
    base = json.loads(SENSOR_EVENT_AVRO)
    # adding a field WITH a default: compatible
    with_default = dict(base)
    with_default["fields"] = base["fields"] + [
        {"name": "battery", "type": ["null", "float"], "default": None}
    ]
    assert check_backward_compatible(SENSOR_EVENT_AVRO, json.dumps(with_default)) == []
    # adding a required field without default: violation (the negative
    # test the reference runs against the live registry,
    # docs/data-contracts.md:252-275)
    without_default = dict(base)
    without_default["fields"] = base["fields"] + [
        {"name": "firmware", "type": "string"}
    ]
    problems = check_backward_compatible(
        SENSOR_EVENT_AVRO, json.dumps(without_default)
    )
    assert any("firmware" in p for p in problems)


def test_kafka_source_options_match_reference():
    opts = kafka_source_options("broker:9092", "sensor-events")
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"
    assert opts["subscribe"] == "sensor-events"


def test_value_histogram_hand_computed(spark):
    """4 bins over [0, 8): below-lo clamps to bin 0, at-hi clamps to
    the last bin, NULLs drop, empty bins emit n = 0."""
    from cassandra_iot_pipeline_spark.operators.stats import value_histogram

    rows = [(-1.0,), (0.0,), (1.9,), (2.0,), (8.0,), (9.5,), (None,)]
    df = spark.createDataFrame(rows, "value DOUBLE")
    got = {
        r["bin"]: (r["n"], r["lo_edge"], r["hi_edge"])
        for r in value_histogram(df, 4, 0.0, 8.0).collect()
    }
    assert got == {
        0: (3, 0.0, 2.0),   # -1.0 clamped, 0.0, 1.9
        1: (1, 2.0, 4.0),   # 2.0
        2: (0, 4.0, 6.0),
        3: (2, 6.0, 8.0),   # 8.0 and 9.5 clamped
    }


def test_value_histogram_fixture_parity(spark, duck):
    from cassandra_iot_pipeline_spark.operators.stats import (
        value_histogram,
        value_histogram_oracle,
    )
    from tools.oracle_check import compare

    events = load_table(spark, SF_DIR, "events")
    for nb, lo, hi in [(20, 0.0, 100.0), (7, -3.3, 44.2), (1, 0.0, 1.0)]:
        got = value_histogram(events, nb, lo, hi).toPandas()
        want = duck.sql(value_histogram_oracle(nb, lo, hi)).df()
        assert compare(got, want) == [], nb
        assert got.n.sum() == 1000  # every non-null row exactly once


def test_value_histogram_auto_domain(spark):
    """Domain from the data: total count preserved and edges span
    exactly [min, max]."""
    from cassandra_iot_pipeline_spark.operators.stats import value_histogram

    events = load_table(spark, SF_DIR, "events")
    pdf = value_histogram(events, 10).toPandas().sort_values("bin")
    raw = events.toPandas()["value"]
    assert pdf.n.sum() == raw.notna().sum()
    assert pdf.lo_edge.iloc[0] == raw.min()
    assert abs(pdf.hi_edge.iloc[-1] - raw.max()) < 1e-9
