"""Large-scale training-data pipeline operators (SURVEY.md §7.2 step 6).

Beyond the reference's IoT surface: the operations a 100 TB LLM-data
pipeline runs over document/embedding tables.

    text       -- tokenization, quality scoring, language ID, fingerprints
    dedup      -- exact, blocked-Jaccard, MinHash-LSH, SimHash near-dup
    similarity -- cosine top-k (brute force + LSH-bucketed scale path)
    multimodal -- opaque binary columns: metadata, decode/frame plumbing
"""
