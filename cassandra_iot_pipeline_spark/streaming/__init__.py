"""Structured Streaming layer (SURVEY.md §2.J W1-W8, §2.K sinks).

    pipeline -- the two continuous queries of the reference
                (raw passthrough + watermarked hourly aggregation)
    sinks    -- upsert-by-PK parquet sink (Cassandra last-write-wins
                analogue) + compaction job
    staging  -- stages fixture tables as time-ordered file sequences so
                a file source can replay them as micro-batches
    joins    -- watermarked stream-stream funnel join
    stateful -- applyInPandasWithState sessionization
    anomaly  -- per-device jump detector (transformWithStateInPandas
                when the runtime has protobuf; applyInPandasWithState
                fallback otherwise)
    dedup    -- exactly-once ingest landing via
                dropDuplicatesWithinWatermark + the near-dup curation
                pipeline (foreachBatch over the persisted LSH store)
    ann      -- continuous ANN-index ingestion (foreachBatch over the
                persisted IVFADC store)
    rates    -- continuous counter-rate (bit-identical to the batch
                operator on day-ordered replays)
    cassandra -- connector sink options (prod backend; no cluster here)
"""
