"""Duplicate-cluster resolution (functions/clusters.py).

Oracle: a pure-Python union-find over the same pair list — exact
component structure, independently computed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.functions.clusters import (
    connected_components,
    connected_components_routed,
    resolve_duplicates,
)
from cassandra_iot_pipeline_spark.functions.dedup import blocked_jaccard_pairs
from cassandra_iot_pipeline_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Map each vertex to its component's minimum vertex id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "doc_a long, doc_b long"
    )


CHAIN = [(1, 2), (2, 3), (3, 4), (4, 5)]
CLIQUE = [(10, 11), (10, 12), (11, 12)]
PAIR = [(20, 21)]
BRIDGE = [(30, 31), (32, 33), (31, 32)]  # two pairs fused by a bridge


@pytest.mark.parametrize(
    "edges",
    [CHAIN, CLIQUE, PAIR, CHAIN + CLIQUE + PAIR + BRIDGE],
    ids=["chain", "clique", "pair", "mixed"],
)
def test_components_match_union_find(spark, edges):
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs_df(spark, edges)).collect()
    }
    assert got == union_find(edges)


def test_chain_needs_propagation_rounds(spark):
    # a 9-hop chain: label 100 must travel the full diameter
    edges = [(100 + i, 100 + i + 1) for i in range(9)]
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs_df(spark, edges)).collect()
    }
    assert set(got.values()) == {100}


def test_max_iterations_guard_trips(spark):
    edges = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(pairs_df(spark, edges), max_iterations=2)


def test_resolve_duplicates_on_fixture(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pairs = blocked_jaccard_pairs(docs, threshold=0.5)
    resolved = resolve_duplicates(docs, pairs)

    # oracle: union-find over the collected pairs (fixture-sized)
    edge_list = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    uf = union_find(edge_list)
    expected_dropped = {v for v, root in uf.items() if root != v}
    n_docs = docs.count()

    assert resolved.count() == n_docs - len(expected_dropped)
    # survivors: every doc except non-root members of duplicate clusters
    survivor_ids = {r["doc_id"] for r in resolved.select("doc_id").collect()}
    assert survivor_ids == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    } - expected_dropped

    # audit columns: cluster roots carry their cluster size - 1
    cluster_sizes: dict[int, int] = {}
    for v, root in uf.items():
        cluster_sizes[root] = cluster_sizes.get(root, 0) + 1
    audited = {
        r["doc_id"]: r["n_duplicates"]
        for r in resolved.select("doc_id", "n_duplicates").collect()
    }
    for root, size in cluster_sizes.items():
        assert audited[root] == size - 1
    # singletons audit as 0 duplicates, cluster_id == doc_id
    singleton = resolved.filter(F.col("n_duplicates") == 0).first()
    assert singleton["cluster_id"] == singleton["doc_id"]


def test_resolved_corpus_keeps_document_schema(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pairs = blocked_jaccard_pairs(docs, threshold=0.5)
    resolved = resolve_duplicates(docs, pairs)
    assert set(docs.columns) | {"cluster_id", "n_duplicates"} == set(
        resolved.columns
    )


@pytest.mark.parametrize(
    "edges",
    [CHAIN, CLIQUE, PAIR, CHAIN + CLIQUE + PAIR + BRIDGE],
    ids=["chain", "clique", "pair", "mixed"],
)
def test_routed_components_match_both_tiers(spark, edges):
    """connected_components_routed: the driver union-find tier and the
    forced distributed tier (max_driver_pairs=0) produce identical
    labelings — and both match the reference union-find."""
    expect = union_find(edges)
    df = pairs_df(spark, edges)
    for bound in (100_000, 0):  # driver tier, then forced distributed
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components_routed(
                df, max_driver_pairs=bound
            ).collect()
        }
        assert got == expect, f"bound={bound}"


def test_routed_components_empty_pairs(spark):
    df = pairs_df(spark, [])
    out = connected_components_routed(df)
    assert out.count() == 0
    assert out.columns == ["doc_id", "cluster_id"]


def test_resolve_by_priority(spark):
    """Survivor = max priority per cluster (NULLs last, ties by min
    doc_id); singletons untouched; audit columns identical in shape to
    the base operator; constant priority degenerates to the base
    operator row for row."""
    from cassandra_iot_pipeline_spark.functions.clusters import (
        resolve_duplicates,
        resolve_duplicates_by_priority,
    )

    docs = spark.createDataFrame(
        [
            (1, "a", 0.2), (2, "a2", 0.9), (3, "a3", 0.9),  # cluster {1,2,3}
            (4, "b", None), (5, "b2", 0.1),                  # cluster {4,5}
            (6, "solo", 0.5),
        ],
        "doc_id BIGINT, text STRING, q DOUBLE",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a BIGINT, doc_b BIGINT"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["n_duplicates"])
        for r in resolve_duplicates_by_priority(
            docs, pairs, "q"
        ).collect()
    }
    # cluster {1,2,3}: 0.9 tie -> min doc_id 2 survives; label stays 1
    # cluster {4,5}: NULL ranks last -> 5 survives; label stays 4
    assert got == {2: (1, 2), 5: (4, 1), 6: (6, 0)}
    # constant priority == the base min-doc_id operator, bit for bit
    const = resolve_duplicates_by_priority(
        docs.withColumn("q", F.lit(1.0)), pairs, "q"
    ).drop("q")
    base = resolve_duplicates(docs, pairs).drop("q")
    assert sorted(tuple(r) for r in const.collect()) == sorted(
        tuple(r) for r in base.collect()
    )
