"""Duplicate-cluster resolution: near-dup *pairs* -> deduplicated corpus.

Every near-dup tier in :mod:`.dedup` / :mod:`.similarity` emits candidate
*pairs* (doc_a, doc_b). Removing duplicates needs one more step the pair
operators deliberately leave out: transitive closure. If A~B and B~C,
then {A, B, C} is one duplicate cluster and exactly one document of the
three survives — pairwise removal alone would either drop too many
(remove both members of every pair) or too few (keep C because it was
never directly paired with A).

``connected_components`` computes the closure distributively with
min-label propagation:

- each doc starts labeled with itself;
- each round every doc takes the minimum label among itself and its
  neighbors (one join edges x labels + one min-aggregation — two
  shuffles on 8-byte keys, no payload columns move);
- converged when no label changes.

Rounds needed = the graph diameter. Duplicate graphs are near-cliques
(tiny diameter), so 2-4 rounds is typical; a ``max_iterations`` guard
fails fast on adversarial chains instead of looping unbounded. Lineage
is truncated each round with ``localCheckpoint`` — iterative DataFrame
joins otherwise stack an exponentially-deepening plan that overwhelms
the optimizer long before the data is large. (On a real cluster with a
reliable checkpoint dir, swap ``localCheckpoint`` for ``checkpoint``;
for graphs whose diameter is genuinely large, the alternating
large-star/small-star algorithm of Kiveris et al., "Connected
Components in MapReduce and Beyond", converges in O(log^2 n) rounds
over the same two-shuffle primitive.)

100 TB posture: state per round is one (doc_id, label) row per
*paired* document — duplicates are a small fraction of a deduped
corpus, and docs with no near-dup pair never enter the loop at all
(they are joined back as singletons at the end). The per-round shuffle
moves two longs per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: duplicate graphs are near-cliques; a chain this long means the pair
#: generator's threshold is drifting (each hop is a >= t match while the
#: endpoints may share almost nothing) — fail fast rather than loop.
MAX_CC_ITERATIONS = 25


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = MAX_CC_ITERATIONS,
) -> DataFrame:
    """Label each vertex of the pair graph with the minimum vertex id of
    its connected component.

    Returns ``(doc_id, cluster_id)`` for every vertex that appears in
    ``pairs``. Deterministic: the cluster id is the component's minimum
    doc_id, independent of partitioning or iteration order.
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # symmetrize once; propagation below then only needs one direction
    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = edges.distinct().localCheckpoint()
    labels = (
        edges.select("u").distinct().withColumn("label", F.col("u")).localCheckpoint()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.select(F.col("u").alias("v"), "label"), "v"
            )
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        # the change flag is computed inside the update itself (the old
        # label is already on the row), so convergence detection costs a
        # filter over the just-materialized checkpoint instead of a
        # labels-vs-labels re-join per round
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
                (F.coalesce("nbr_label", "label") < F.col("label")).alias(
                    "_chg"
                ),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            return labels.select(
                F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"connected_components: no convergence in {max_iterations} rounds — "
        "the pair graph has a path longer than the expected near-clique "
        "duplicate structure; raise max_iterations explicitly or tighten "
        "the pair generator's threshold"
    )


#: pair-count bound for the driver union-find tier: 100k pairs is
#: ~1.6 MB of longs on the driver — control-plane-sized, like the IVF
#: centroid fetch. Past it, the distributed min-label loop takes over.
MAX_DRIVER_PAIRS = 100_000


def connected_components_routed(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_driver_pairs: int = MAX_DRIVER_PAIRS,
) -> DataFrame:
    """:func:`connected_components` with a small-graph fast tier.

    The distributed min-label loop pays 2 jobs per round (checkpoint +
    convergence probe) whatever the data size — ~1.5-3 s of fixed
    overhead for a graph of a dozen edges. Duplicate-pair graphs from a
    single ingest batch are usually control-plane-sized, so up to
    ``max_driver_pairs`` edges (bounded ``limit(n+1).collect()`` — one
    job, ≤ ~1.6 MB of longs at the default bound) the closure runs as
    an in-driver union-find; beyond the bound the distributed loop
    takes over unchanged. Same output contract either way:
    ``(doc_id, cluster_id)`` for every vertex in ``pairs``, cluster id
    = component minimum, deterministic.
    """
    # persist across the probe: if the bound is exceeded, the expensive
    # pairs subtree (LSH candidates + shingle verification, in the
    # incremental caller) would otherwise execute twice — once for this
    # probe, again for the distributed tier's edge materialization.
    # persist (not an eager localCheckpoint) is deliberate: the common
    # small-graph case may satisfy limit(n+1) from a few partitions,
    # and an eager checkpoint would force the full subtree up front for
    # every caller. The trade is that a MEMORY_AND_DISK eviction
    # between probe and fallback re-runs the subtree — accepted: the
    # pair frame is two longs per edge (control-plane-sized at the
    # bound), far below any realistic eviction pressure.
    pairs = pairs.select(src, dst).persist()
    try:
        head = pairs.limit(max_driver_pairs + 1).collect()
        if len(head) > max_driver_pairs:
            # connected_components checkpoints its edge frame eagerly,
            # so the cached pairs are consumed before unpersist.
            return connected_components(pairs, src=src, dst=dst)
    finally:
        pairs.unpersist()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in head:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # min-label per component (the union order above is arbitrary; the
    # deterministic contract comes from this relabeling)
    root_min: dict[int, int] = {}
    for v in parent:
        rv = find(v)
        root_min[rv] = min(root_min.get(rv, v), v)
    rows = [(v, root_min[find(v)]) for v in sorted(parent)]
    from ..litframe import literal_frame

    return literal_frame(
        pairs.sparkSession, rows, "doc_id BIGINT, cluster_id BIGINT"
    )


def resolve_duplicates(
    documents: DataFrame,
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Materialize the deduplicated corpus: one surviving document per
    duplicate cluster (the minimum ``doc_id`` — deterministic and
    tier-agnostic), all unpaired documents untouched.

    Output schema = ``documents`` plus ``cluster_id`` (the component
    id; equals ``doc_id`` for singletons) and ``n_duplicates`` (cluster
    size - 1; 0 for singletons) — the audit columns a curation pipeline
    reports before dropping them.

    The join back to ``documents`` is a left join on doc_id against the
    (small) component labeling, so the full corpus is scanned exactly
    once and only label rows shuffle.
    """
    cc = connected_components(pairs, src=src, dst=dst)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("_sz"))
    keepers = (
        cc.join(sizes, "cluster_id")
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id", "cluster_id", (F.col("_sz") - 1).alias("n_duplicates"))
    )
    dropped = cc.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return (
        documents.join(dropped, "doc_id", "left_anti")
        .join(keepers, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
        .withColumn("n_duplicates", F.coalesce("n_duplicates", F.lit(0)))
    )


def resolve_duplicates_by_priority(
    documents: DataFrame,
    pairs: DataFrame,
    priority_col: str,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """:func:`resolve_duplicates` with a caller-chosen survivor: per
    duplicate cluster, keep the member with the HIGHEST
    ``priority_col`` (quality score, token count, recency...) instead
    of the lowest doc_id — "of these near-identical documents, train
    on the best one". Ties (and NULL priorities, ranked last) break by
    min doc_id, so the choice stays deterministic and
    partition-invariant; with a constant priority the output is
    row-identical to :func:`resolve_duplicates` (pinned in tests).

    Output schema and audit columns match :func:`resolve_duplicates`
    (``cluster_id`` stays the component's min-doc_id LABEL even when a
    higher-id member survives — the cluster's identity is not a
    function of the survivor policy).

    Plan: the ranking window runs over the component labeling only
    (paired docs — pair-proportional, never the corpus), joined to a
    two-column pruned projection of the corpus for the priorities; the
    corpus-wide joins are the same label-sized probes as the base
    operator."""
    from pyspark.sql import Window

    cc = connected_components(pairs, src=src, dst=dst)
    pri = documents.select(
        "doc_id", F.col(priority_col).alias("_pri")
    )
    ranked = cc.join(pri, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_pri").desc_nulls_last(), F.col("doc_id")
    )
    wsz = Window.partitionBy("cluster_id")
    marked = ranked.select(
        "doc_id",
        "cluster_id",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(wsz).alias("_sz"),
    )
    keepers = marked.filter(F.col("_rk") == 1).select(
        "doc_id", "cluster_id", (F.col("_sz") - 1).alias("n_duplicates")
    )
    dropped = marked.filter(F.col("_rk") != 1).select("doc_id")
    return (
        documents.join(dropped, "doc_id", "left_anti")
        .join(keepers, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
        .withColumn("n_duplicates", F.coalesce("n_duplicates", F.lit(0)))
    )
