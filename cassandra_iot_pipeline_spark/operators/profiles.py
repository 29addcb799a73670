"""Device behavior profiles + time-series similarity search.

The IoT-analytics capstone (pattern from distributed time-series
similarity search literature, e.g. EDBT'19): summarize each device's
behavior as a 24-dim hour-of-day profile vector (average measure per
hour bucket, exact integer arithmetic), then find the most similar
devices by cosine — "which sensors behave alike" over the same engine
primitives as the embedding similarity suite.

Everything stays exact: per-bin averages quantize to integer
centi-cents with one correctly-rounded division (both engines round
half-up for positives, including exact .5 boundaries), missing bins
zero-fill identically, and the cosine is the quantized-integer dot of
functions/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def device_profiles(events: DataFrame) -> DataFrame:
    """(user_id, profile: array<long>[24]) — avg value per hour-of-day
    in centi-cents, zero-filled for empty bins."""
    binned = (
        events.groupBy(
            "user_id", F.hour(F.col("ts")).cast("int").alias("hod")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .select(
            "user_id",
            "hod",
            # centi-cents per bin: one correctly-rounded division
            F.round(F.col("s") * F.lit(100.0) / F.col("c")).cast("long").alias("u"),
        )
    )
    by_user = binned.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("hod", "u")))
        ).alias("m")
    )
    profile = F.transform(
        F.sequence(F.lit(0), F.lit(23)),
        lambda h: F.coalesce(F.element_at(F.col("m"), h.cast("int")), F.lit(0)),
    )
    return by_user.select("user_id", profile.alias("profile"))


#: exact-tier fleet cap: below this the GEMM-tiled all-pairs runs (a
#: 64k x 24 profile matrix is ~12 MB — trivially exact); above it the
#: LSH-bucketed candidate path takes over (sub-quadratic, recall < 1,
#: pinned by tests).
EXACT_FLEET_CAP = 65_536


def similar_devices(
    events: DataFrame,
    k: int = 3,
    exact_fleet_cap: int = EXACT_FLEET_CAP,
    fleet_size: int | None = None,
) -> DataFrame:
    """Top-k most similar devices per device by hour-of-day profile
    cosine — tier-routed for fleet scale:

    - fleet <= ``exact_fleet_cap``: exact GEMM-tiled all-pairs
      (:func:`~..functions.similarity.gemm_self_topk`) — bit-identical
      to the all-pairs oracle, one dense matmul per block pair instead
      of the BroadcastNestedLoopJoin the naive ``!=`` join plans.
    - larger fleets: sign-bit LSH bucketed candidates + exact re-rank
      (:func:`~..functions.similarity.lsh_self_topk`) — shuffles 8-byte
      signatures, sub-quadratic candidates, approximate recall.

    Routing stays lazy when the caller supplies ``fleet_size`` (a fleet
    cardinality hint — exactness of the hint only affects tier choice,
    never results): constructing the query then triggers **zero** jobs.
    Without a hint the probe is one ``approx_count_distinct`` over the
    pruned ``user_id`` column (a single narrow scan, no payload
    shuffle) — fine interactively, but at 100 TB that is a full-table
    scan per invocation, so batch pipelines should pass the hint (e.g.
    from table statistics or the device registry's row count).
    """
    from ..functions.similarity import gemm_self_topk, lsh_self_topk

    profiles = device_profiles(events)
    fleet = fleet_size
    if fleet is None:
        fleet = events.agg(
            F.approx_count_distinct("user_id").alias("n")
        ).first()["n"]
    if fleet <= exact_fleet_cap:
        ranked = gemm_self_topk(
            profiles, "user_id", "profile", k, expected_rows=fleet
        )
    else:
        ranked = lsh_self_topk(profiles, "user_id", "profile", k, dims=24)
    return ranked.select(
        F.col("id_a").alias("device_a"),
        F.col("id_b").alias("device_b"),
        "cosine",
        "rank",
    )


def similar_devices_allpairs(events: DataFrame, k: int = 3) -> DataFrame:
    """The naive all-pairs form (non-equi self-join -> per-pair Catalyst
    fold): kept as the independent oracle tier — tests assert
    :func:`similar_devices` equals this bit-for-bit on fixture fleets.
    Not a scale path (BroadcastNestedLoopJoin, quadratic)."""
    profiles = device_profiles(events)

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    norms = profiles.withColumn("n2", dot(F.col("profile"), F.col("profile")))
    a = norms.select(
        F.col("user_id").alias("device_a"),
        F.col("profile").alias("pa"),
        F.col("n2").alias("na"),
    )
    b = norms.select(
        F.col("user_id").alias("device_b"),
        F.col("profile").alias("pb"),
        F.col("n2").alias("nb"),
    )
    cos = dot(F.col("pa"), F.col("pb")).cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    scored = (
        a.join(b, F.col("device_a") != F.col("device_b"))
        .select("device_a", "device_b", cos.alias("cosine"))
    )
    w = Window.partitionBy("device_a").orderBy(
        F.col("cosine").desc(), F.col("device_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("device_a", "device_b", "cosine", "rank")
    )


def similar_devices_oracle(k: int = 3) -> str:
    return f"""
        WITH binned AS (
            SELECT user_id,
                   CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
                   CAST(ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100.0
                        / COUNT(*)) AS BIGINT) AS u
            FROM events
            GROUP BY 1, 2
        ),
        users AS (SELECT DISTINCT user_id FROM events),
        hours AS (SELECT UNNEST(range(24)) AS hod),
        grid AS (
            SELECT u.user_id, h.hod, COALESCE(b.u, 0) AS u
            FROM users u CROSS JOIN hours h
            LEFT JOIN binned b ON b.user_id = u.user_id AND b.hod = h.hod
        ),
        profiles AS (
            SELECT user_id, array_agg(u ORDER BY hod) AS profile
            FROM grid GROUP BY user_id
        ),
        norms AS (
            SELECT user_id, profile,
                   CAST(list_aggregate(list_transform(list_zip(profile, profile),
                        p -> p[1] * p[2]), 'sum') AS BIGINT) AS n2
            FROM profiles
        ),
        scored AS (
            SELECT a.user_id AS device_a, b.user_id AS device_b,
                   CAST(CAST(list_aggregate(list_transform(
                        list_zip(a.profile, b.profile), p -> p[1] * p[2]),
                        'sum') AS BIGINT) AS DOUBLE)
                   / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
                       AS cosine
            FROM norms a JOIN norms b ON a.user_id <> b.user_id
        )
        SELECT device_a, device_b, cosine, rank
        FROM (
            SELECT device_a, device_b, cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY device_a
                       ORDER BY cosine DESC, device_b ASC
                   ) AS rank
            FROM scored
        )
        WHERE rank <= {k}
    """
