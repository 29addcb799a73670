"""Physical-plan assertions — the 100 TB posture checks.

Correct results are necessary but not sufficient: these tests pin the
*plans* (pushdown reached the scan, dim joins broadcast, top-k compiled
to TakeOrderedAndProject) so a regression that silently de-optimizes a
query fails CI."""

from __future__ import annotations

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators.joins import enrich_customers
from cassandra_iot_pipeline_spark.operators.serving import (
    categorical_filter,
    point_lookup,
    top_k_orders,
)
from cassandra_iot_pipeline_spark.plans import (
    assert_broadcast_join,
    formatted_plan,
)
from tests.conftest import SF_DIR


def test_point_lookup_filter_pushed(spark):
    events = load_table(spark, SF_DIR, "events")
    plan = formatted_plan(point_lookup(events, 13))
    assert "PushedFilters" in plan
    assert "EqualTo(user_id,13)" in plan


def test_categorical_filter_pushed(spark):
    events = load_table(spark, SF_DIR, "events")
    plan = formatted_plan(categorical_filter(events, "purchase"))
    assert "PushedFilters" in plan and "event_type" in plan


def test_enrichment_join_is_broadcast(spark):
    df = enrich_customers(
        load_table(spark, SF_DIR, "customer"),
        load_table(spark, SF_DIR, "nation"),
        load_table(spark, SF_DIR, "region"),
    )
    assert_broadcast_join(df)
    # the fact side must not shuffle: no Exchange above the customer scan
    plan = formatted_plan(df)
    assert "Exchange hashpartitioning" not in plan


def test_top_k_is_take_ordered(spark):
    orders = load_table(spark, SF_DIR, "orders")
    plan = formatted_plan(top_k_orders(orders, 10))
    assert "TakeOrderedAndProject" in plan
