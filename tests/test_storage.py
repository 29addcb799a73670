"""At-rest layout tests (SURVEY §4.2): date partition pruning, bucketed
shuffle-free joins, small-file compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark import storage
from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.plans import formatted_plan
from tests.conftest import SF_DIR


def test_events_layout_roundtrip_and_pruning(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_tbl")
    storage.write_events_table(events, path)
    back = storage.read_events_table(spark, path)
    assert back.count() == events.count()
    assert sorted(back.columns) == sorted(events.columns)
    # date predicate must prune partitions, not scan-and-filter
    pruned = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-05")
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "event_date" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    storage.write_bucketed(orders, "b_orders", "o_orderkey", 8, "o_orderkey")
    storage.write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, "l_orderkey")
    # force SortMergeJoin (at fixture scale AQE would broadcast the small
    # side — fine in production, but here we are asserting the bucketed
    # co-location property, which is what survives at 100 TB where
    # neither side broadcasts)
    joined = spark.table("b_lineitem").hint("merge").join(
        spark.table("b_orders").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = formatted_plan(joined)
    assert "Exchange hashpartitioning" not in plan, (
        f"bucketed join still shuffles:\n{plan}"
    )
    assert "SortMergeJoin" in plan
    # sanity: results identical to the plain-parquet join
    expected = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert joined.count() == expected
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")


def test_compact_small_files(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "frag")
    events.repartition(40).write.parquet(path)
    n_before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n_before >= 40
    storage.compact_small_files(spark, path, target_file_mb=128)
    n_after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n_after < n_before
    assert spark.read.parquet(path).count() == events.count()
