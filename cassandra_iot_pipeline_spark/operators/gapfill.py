"""Time-series gap filling: dense bucket grid + LOCF + linear
interpolation — the hypertable serving primitive the reference's
rollup table implies but never materializes.

The reference's `hourly_aggregates` table is written sparse: a
(device, hour) row exists only when the device emitted events that
hour (reference: iot-cassandra-pipeline/src/spark_consumer.py:169-186;
init.cql:41-54). Every dashboard consuming it (monitoring/monitor.sh's
per-hour panels) then has to handle missing buckets client-side. This
module closes that gap engine-side, with the semantics of
TimescaleDB's `time_bucket_gapfill` + `locf()` + `interpolate()`.

Plan shape (the 100 TB argument): the naive formulation — build a
per-key MIN/MAX spine, explode a dense calendar, left-join the sparse
aggregate back in — reads raw events TWICE (the spine's min/max
collapses into its own scan) and pays a join. This implementation
does neither. After the one (key, bucket) aggregation pass over raw
events, a single `lead()` window pairs each observation with its
successor, and `explode(sequence(bucket, next_bucket - stride))`
generates that observation's own gap run:

* every generated row carries its generating observation (= the LOCF
  value, by definition) and the `lead` observation (= the forward
  interpolation anchor) — no IGNORE-NULLS search, no join back;
* total plan: ONE raw scan, ONE shuffle to the hourly aggregate, ONE
  window shuffle over the ~10^3x-smaller aggregate, a Generate, a
  Project. Zero joins, zero re-scans;
* fan-out is per-gap: one source row emits `gap_hours` rows. Bounded
  by the longest silent interval per key (8,760 rows for a key silent
  one year at hourly stride) — pathological multi-year gaps would be
  pre-split upstream, the same posture as the LSH hot-bucket cap.

Exactness (the repo-wide rule, operators/exactmath.py): hourly means
are *millicents* — ``SUM(cents) * 1000 DIV COUNT`` — and the
interpolation is pure BIGINT arithmetic::

    interp = prev + ((next - prev) * (pos - prev_pos)) DIV (next_pos - prev_pos)

Both engines truncate integer division toward zero (Spark ``div``,
DuckDB ``//``), so the result is bit-identical regardless of partition
layout — no IEEE accumulation anywhere in the fill path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: grid stride of the registered form (the reference's rollup grain)
STRIDE_HOURS = 1


def gapfill_hourly(events: DataFrame) -> DataFrame:
    """Dense hourly per-user grid over ``events`` with exact LOCF and
    linear-interpolated millicent averages. Registered form of the
    general fill (stride fixed at the reference's hourly grain).

    Output, one row per (user_id, hour in [first, last] active hour):

    * ``n_events`` — 0 on gap rows;
    * ``locf_millicents`` — last observed hourly mean (exact
      millicents) carried forward;
    * ``interp_millicents`` — linear fill between the surrounding
      observations (equals the observed mean on non-gap rows);
    * ``is_gap``.

    Every column is structurally non-null: each gap run is generated
    BY its preceding observation and runs only TO the next one, so the
    spine starts and ends at observed buckets and the TimescaleDB edge
    cases (locf null before first, interpolate null outside the
    observed range) are unreachable by construction.
    """
    stride = F.expr(f"INTERVAL {STRIDE_HOURS} HOUR")
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        events.select(
            "user_id", F.date_trunc("hour", "ts").alias("bucket"), cents.alias("c")
        )
        .groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("c").alias("sum_cents"))
        .select(
            "user_id",
            "bucket",
            "n_events",
            # exact hourly mean in millicents (BIGINT; DIV truncates —
            # sums are non-negative so trunc == floor in both engines)
            F.expr("sum_cents * 1000 DIV n_events").alias("avg_mc"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    paired = agg.select(
        "user_id",
        "bucket",
        "n_events",
        "avg_mc",
        F.lead("bucket").over(w).alias("next_bucket"),
        F.lead("avg_mc").over(w).alias("next_mc"),
    )
    # each observation emits itself + its gap run [bucket, next) —
    # the per-key union of these runs IS the dense spine
    g = paired.select(
        "user_id",
        "n_events",
        "avg_mc",
        "next_mc",
        (F.unix_timestamp("bucket") / F.lit(3600)).cast("long").alias("pos"),
        (F.unix_timestamp("next_bucket") / F.lit(3600)).cast("long").alias(
            "next_pos"
        ),
        F.explode(
            F.sequence(
                "bucket",
                F.coalesce(F.col("next_bucket") - stride, F.col("bucket")),
                stride,
            )
        ).alias("gbucket"),
    )
    gpos = (F.unix_timestamp("gbucket") / F.lit(3600)).cast("long")
    observed = gpos == F.col("pos")
    interp = F.when(observed, F.col("avg_mc")).otherwise(
        F.col("avg_mc")
        + F.expr("((next_mc - avg_mc) * (gpos - pos)) DIV (next_pos - pos)")
    )
    return g.withColumn("gpos", gpos).select(
        "user_id",
        F.unix_micros(F.col("gbucket")).alias("bucket_us"),
        F.when(observed, F.col("n_events")).otherwise(F.lit(0)).alias("n_events"),
        F.col("avg_mc").alias("locf_millicents"),
        interp.alias("interp_millicents"),
        (~observed).alias("is_gap"),
    )


def gapfill_hourly_oracle() -> str:
    """DuckDB twin: the same lead()-anchored gap-run expansion
    (generate_series is inclusive on both ends, like Spark sequence)
    and the same BIGINT millicent arithmetic (`//` and `DIV` both
    truncate toward zero)."""
    return f"""
        WITH agg AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket,
                   COUNT(*) AS n_events,
                   -- DuckDB SUM(BIGINT) is HUGEINT; BIGINT keeps the
                   -- whole fill path in the driver-hash int class
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_cents
            FROM events GROUP BY 1, 2
        ),
        paired AS (
            SELECT user_id, bucket, n_events,
                   sum_cents * 1000 // n_events AS avg_mc,
                   LEAD(bucket) OVER w AS next_bucket,
                   LEAD(sum_cents * 1000 // n_events) OVER w AS next_mc
            FROM agg
            WINDOW w AS (PARTITION BY user_id ORDER BY bucket)
        ),
        g AS (
            SELECT user_id, n_events, avg_mc, next_mc,
                   CAST(epoch(bucket) AS BIGINT) // 3600 AS pos,
                   CAST(epoch(next_bucket) AS BIGINT) // 3600 AS next_pos,
                   UNNEST(generate_series(
                       bucket,
                       COALESCE(next_bucket - INTERVAL {STRIDE_HOURS} HOUR,
                                bucket),
                       INTERVAL {STRIDE_HOURS} HOUR)) AS gbucket
            FROM paired
        )
        SELECT user_id,
               epoch_us(gbucket) AS bucket_us,
               CASE WHEN CAST(epoch(gbucket) AS BIGINT) // 3600 = pos
                    THEN n_events ELSE 0 END AS n_events,
               avg_mc AS locf_millicents,
               CASE WHEN CAST(epoch(gbucket) AS BIGINT) // 3600 = pos
                    THEN avg_mc
                    ELSE avg_mc + ((next_mc - avg_mc)
                         * (CAST(epoch(gbucket) AS BIGINT) // 3600 - pos))
                         // (next_pos - pos)
               END AS interp_millicents,
               (CAST(epoch(gbucket) AS BIGINT) // 3600 <> pos) AS is_gap
        FROM g
    """
