"""Deduplication operators over the ``documents`` table.

Four tiers, trading exactness for scale:

- **exact**: hash-groupBy on the canonical text — one shuffle keyed by
  the canonical form; at 100 TB, group by xxhash64(canonical) first so
  the shuffle key is 8 bytes, then verify within hash buckets.
- **blocked Jaccard**: exact n-gram Jaccard within cheap blocking keys —
  quadratic only inside blocks, fully SQL-expressible (oracle-checked).
- **MinHash + LSH**: shingle -> 64 hash permutations -> banded buckets ->
  candidate pairs -> exact-Jaccard verification. Near-linear: the only
  quadratic work is within LSH buckets. The standard web-scale text
  dedup design (Broder; used by most pretraining pipelines).
- **SimHash**: 64-bit sign-fingerprint; near-dups = small Hamming
  distance. Bit arithmetic in Catalyst expressions.

MinHash/SimHash use xxhash64 (no DuckDB twin) so their driver checks
are rows-only; their *verification* stage (exact Jaccard) and the
blocked-Jaccard operator carry full oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _oracle_tokens, tokens

SHINGLE_N = 5
N_HASHES = 64
LSH_BANDS = 16
LSH_ROWS = 4  # N_HASHES = LSH_BANDS * LSH_ROWS


def canonical(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


# --- exact dedup -------------------------------------------------------------


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per canonical text; report group size.
    One shuffle on the canonical key (at 100 TB: pre-hash the key)."""
    return (
        documents.select("doc_id", canonical(F.col("text")).alias("canon"))
        .groupBy("canon")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


def exact_dedup_oracle() -> str:
    return """
        SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        FROM (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS canon
            FROM documents
        )
        GROUP BY canon
    """


# --- blocked exact Jaccard ----------------------------------------------------


def blocked_jaccard_pairs(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact token-set Jaccard within (lang, source) blocks.

    Blocking makes the quadratic candidate set tractable (only documents
    sharing a block are compared); inside a block the comparison is a
    self-join + array_intersect/array_union — all Catalyst, and exactly
    mirrored by the DuckDB oracle. jaccard = |∩| / |∪| is one exact
    integer division (deterministic)."""
    docs = documents.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(tokens(F.col("text"))).alias("tok"),
    )
    a = docs.alias("a")
    b = docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tok"), F.col("b.tok")))
    union = F.size(F.array_union(F.col("a.tok"), F.col("b.tok")))
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def blocked_jaccard_pairs_oracle(threshold: float = 0.5) -> str:
    toks = f"list_distinct({_oracle_tokens('text')})"
    return f"""
        WITH docs AS (
            SELECT doc_id, lang, source, {toks} AS tok FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               (CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.tok, b.tok)))) AS jaccard
        FROM docs a
        JOIN docs b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        WHERE (CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.tok, b.tok)))) >= {threshold}
    """


# --- MinHash + LSH -------------------------------------------------------------


def shingles(col: Column, n: int = SHINGLE_N) -> Column:
    """Distinct character n-gram shingles of the canonical text."""
    canon = canonical(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(canon) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: canon.substr(i, F.lit(n)))
    )


def minhash_signature(shingle_col: Column, n_hashes: int = N_HASHES) -> Column:
    """MinHash signature: for permutation i, min over shingles of
    xxhash64(i, shingle). Pure Catalyst array expressions."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingle_col, lambda s: F.xxhash64(F.lit(i), s))
            )
            for i in range(n_hashes)
        ]
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = N_HASHES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Near-dup candidate generation + verification:

    1. signature: n_hashes MinHash values per doc (narrow, no shuffle);
    2. banding: hash each band of rows = n_hashes/bands values; explode
       to (band_idx, band_hash, doc_id);
    3. bucket join: docs sharing any (band_idx, band_hash) are
       candidates — the only shuffle, keyed by the band hash;
    4. verify candidates with exact shingle-set Jaccard >= threshold.

    Scale: step 3's shuffle carries one 16-byte row per (doc, band) —
    at 100 TB of text this is the standard near-linear dedup plan.
    """
    rows_per_band = n_hashes // bands
    docs = documents.select(
        "doc_id", shingles(F.col("text")).alias("sh")
    ).withColumn("sig", minhash_signature(F.col("sh"), n_hashes))
    banded = docs.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("sig").getItem(b * rows_per_band + r)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = inter.cast("double") / union
    return (
        candidates.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


# --- SimHash --------------------------------------------------------------------


def simhash64(documents: DataFrame) -> DataFrame:
    """64-bit SimHash over token hashes: bit j of the fingerprint is the
    sign of sum over tokens of (bit j of xxhash64(token) ? +1 : -1).

    Expressed as 64 Catalyst aggregate columns over the exploded token
    relation — one shuffle on doc_id, integer state, no UDFs."""
    tok = documents.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
    ).withColumn("h", F.xxhash64(F.col("t")))
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    # shiftleft, not lit(1 << j): 1 << 63 overflows a Java long literal
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.col("h").bitwiseAND(F.shiftleft(one, j)) != 0, 1
                ).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    fp = None
    for j in range(64):
        bit = F.when(F.col(f"b{j}") > 0, F.shiftleft(one, j)).otherwise(zero)
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return bit_sums.select("doc_id", fp.alias("simhash"))


def simhash_near_dup_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit
    chunks (pigeonhole: distance <= 3 over 4 chunks means at least one
    chunk matches exactly — candidates only need to share a chunk)."""
    fps = simhash64(documents)
    chunks = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk_idx", "cc.chunk")
    a = chunks.alias("a")
    b = chunks.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
