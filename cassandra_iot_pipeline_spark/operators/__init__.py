"""Batch operator library — the reference-parity query surface.

Each module maps a section of SURVEY.md §2 to idiomatic, declarative
DataFrame transformations (Catalyst-optimizable, no Python in the row
path):

    exactmath  -- cross-engine-exact aggregation arithmetic
    agg        -- hourly rollup + grouped aggregations (§2.E)
    serving    -- point/range/latest-N serving reads (§2.C/F/G)
    joins      -- enrichment + relational join surface (§2.D)
    upsert     -- PK last-write-wins semantics (§2.K K3)
    setops     -- union / intersect / except surface (§2.H)
    gapfill    -- hypertable gap-fill (dense grid, LOCF, interpolation)
    timeseries -- time-weighted averages + counter rates over
                  irregular samples (exact integer arithmetic)
    scd2       -- SCD type-2 dimension history: versioned snapshot,
                  touched-keys incremental merge, point-in-time
                  enrichment
    cohorts    -- cohort retention matrix (first-period cohorts,
                  distinct activity per offset, retained fraction)
    funnel     -- ordered k-step funnel (greedy-earliest chain,
                  horizon-capped, conversion + step-through rates)
    paths      -- first-order event-transition matrix (the funnel's
                  exploratory complement)
    attribution -- first/last/linear-touch conversion attribution
                  within a lookback (bucketed range join, exact
                  micro-credit sums)
    quantiles  -- DDSketch relative-error quantiles (mergeable
                  log-gamma buckets; the approx tier beside the
                  exact value-count grid)
    downsample -- LTTB visual-fidelity decimation for serving long
                  series at dashboard resolution
"""
