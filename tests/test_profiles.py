"""Tier-routing tests for device-profile similarity (operators/profiles.py):
the GEMM-tiled exact tier must be bit-identical to the independent
all-pairs form, and the LSH fleet tier must hold high recall on the
fixture fleet (hour-of-day profiles — highly correlated vectors, the
hard case for sign-bit LSH)."""

from __future__ import annotations

import pandas as pd

from cassandra_iot_pipeline_spark.catalog import load_table
from cassandra_iot_pipeline_spark.operators import profiles
from tests.conftest import SF_DIR


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["device_a", "rank"]).reset_index(drop=True)


def test_exact_tier_matches_allpairs_bitwise(spark):
    events = load_table(spark, SF_DIR, "events")
    tiered = _sorted(profiles.similar_devices(events).toPandas())
    allpairs = _sorted(profiles.similar_devices_allpairs(events).toPandas())
    pd.testing.assert_frame_equal(tiered, allpairs)  # includes float bits


def test_lsh_tier_recall_on_fixture_fleet(spark):
    events = load_table(spark, SF_DIR, "events")
    exact = profiles.similar_devices(events).toPandas()
    # force the fleet tier by dropping the exact cap to zero
    lsh = profiles.similar_devices(events, exact_fleet_cap=0).toPandas()
    want = set(map(tuple, exact[["device_a", "device_b"]].values))
    got = set(map(tuple, lsh[["device_a", "device_b"]].values))
    recall = len(want & got) / len(want)
    assert recall >= 0.9, f"LSH tier recall {recall:.2f} < 0.9"
    # and whatever the LSH tier returns is exactly scored (same cosine
    # for overlapping pairs)
    merged = exact.merge(lsh, on=["device_a", "device_b"], suffixes=("_e", "_l"))
    assert (merged["cosine_e"] == merged["cosine_l"]).all()


def test_fleet_size_hint_keeps_construction_lazy(spark):
    """With a fleet_size hint, constructing the query must trigger ZERO
    Spark jobs (the eager approx_count_distinct probe is fallback-only
    — at 100 TB it is a full-table scan per invocation), and the hint
    must not change results when it routes to the same tier."""
    events = load_table(spark, SF_DIR, "events")
    sc = spark.sparkContext
    sc.setJobGroup("lazy-hint-check", "similar_devices construction")
    try:
        df = profiles.similar_devices(events, fleet_size=200)
        jobs = sc.statusTracker().getJobIdsForGroup("lazy-hint-check")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert not jobs, (
        f"query construction ran job(s) {list(jobs)} despite fleet_size hint"
    )
    hinted = _sorted(df.toPandas())
    probed = _sorted(profiles.similar_devices(events).toPandas())
    pd.testing.assert_frame_equal(hinted, probed)


def test_gemm_self_topk_multi_block_coverage(spark):
    """Force multiple blocks (block_size smaller than the fleet) to
    exercise cross-block coverage in both directions + the diagonal."""
    from cassandra_iot_pipeline_spark.functions.similarity import gemm_self_topk

    events = load_table(spark, SF_DIR, "events")
    p = profiles.device_profiles(events)
    small_blocks = gemm_self_topk(p, "user_id", "profile", 3, block_size=4)
    one_block = gemm_self_topk(p, "user_id", "profile", 3, block_size=1 << 20)
    a = _sorted(
        small_blocks.toPandas().rename(columns={"id_a": "device_a"})
    )
    b = _sorted(one_block.toPandas().rename(columns={"id_a": "device_a"}))
    pd.testing.assert_frame_equal(a, b)
