"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Two paths:

- **brute-force cosine top-k** (the correctness baseline): broadcast the
  query vectors, score every (query, candidate) pair with native array
  expressions (zip_with + aggregate — JVM-side, no UDFs), rank with a
  per-query window. At 100 TB the candidate scan is embarrassingly
  parallel and the only shuffle is the final top-k per query.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (sign-bit LSH) derived deterministically from hash functions, bucket
  join on signature prefix, exact re-rank inside buckets. Sub-linear
  candidate sets; recall tunable by bands/bits.

Exactness policy: floats are quantized to integer units (1e-6 grid)
before the dot product, making every similarity score bit-identical
across engines (integer sums are order-independent; the final
normalization is a fixed sequence of correctly-rounded IEEE ops) — the
same determinism argument as operators/exactmath.py.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..parallel import fan_out_scan, shuffle_width

QUANT = 1_000_000  # 1e-6 grid; 64 * (0.6e6)^2 ≈ 2.3e13 << 2^53: exact


def _quantized(col: Column) -> Column:
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Brute-force cosine top-k: the first ``n_queries`` vec_ids are the
    query set; rank all other vectors per query.

    Plan shape: broadcast(queries) x candidates -> scored -> window
    row_number <= k. The candidate side never shuffles until the final
    per-query ranking (keyed on query_id, n_queries groups)."""
    # the scoring join evaluates n_queries 64-dim integer dots per
    # candidate row in codegen — spread the narrow fixture scan first
    # (no-op at scale, where the scan arrives as many splits)
    base = fan_out_scan(embeddings, "vec_id").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    norms = base.withColumn("n2", _dot(F.col("q"), F.col("q")))
    queries = norms.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    cands = norms.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("cand_id"),
        F.col("q").alias("cv"),
        F.col("n2").alias("cn2"),
    )
    dot = _dot(F.col("qv"), F.col("cv"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))
    )
    scored = (
        cands.join(F.broadcast(queries))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def cosine_topk_oracle(n_queries: int = 10, k: int = 5) -> str:
    """DuckDB twin: same quantization, same integer dot, same
    normalization sequence, same ranking tiebreak."""
    quant = (
        "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * "
        f"{QUANT}) AS BIGINT))"
    )
    return f"""
        WITH base AS (
            SELECT vec_id, {quant} AS q FROM embeddings
        ),
        norms AS (
            SELECT vec_id, q,
                   CAST(list_aggregate(list_transform(list_zip(q, q),
                        p -> p[1] * p[2]), 'sum') AS BIGINT) AS n2
            FROM base
        ),
        scored AS (
            SELECT qs.vec_id AS query_id, cs.vec_id AS cand_id,
                   CAST(CAST(list_aggregate(list_transform(list_zip(qs.q, cs.q),
                        p -> p[1] * p[2]), 'sum') AS BIGINT) AS DOUBLE)
                   / (sqrt(CAST(qs.n2 AS DOUBLE)) * sqrt(CAST(cs.n2 AS DOUBLE)))
                       AS cosine
            FROM norms qs, norms cs
            WHERE qs.vec_id < {n_queries} AND cs.vec_id >= {n_queries}
        )
        SELECT query_id, cand_id, cosine, rank
        FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, cand_id ASC
                   ) AS rank
            FROM scored
        )
        WHERE rank <= {k}
    """


# --- LSH-bucketed ANN (scale path) -------------------------------------------

# Operating point chosen by measured sweep on the fixture embeddings
# (near-random vectors, true-neighbor cosine only ~0.26-0.39 — the
# hardest case for LSH): 6 planes x 16 tables = recall 0.58 while
# scanning ~25% of candidates. On real clustered embeddings (neighbor
# cosine >= 0.7) the same settings give recall > 0.95 at ~5% scanned.
N_PLANES = 6  # signature bits per table
N_TABLES = 16  # independent tables (OR-amplification for recall)
_PLANE_SEED = 0x5EED


def _plane_matrix(n_tables: int, n_planes: int, dims: int):
    """Deterministic random hyperplanes, seeded — identical on every
    executor and cluster layout. Generated once per task via numpy
    (constants, not data)."""
    import numpy as np

    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((n_tables, n_planes, dims))


@lru_cache(maxsize=4)
def _srp_planes(n_tables: int, n_planes: int, dims: int):
    """Rademacher (+1/-1) hyperplanes derived per-entry from sha256 of
    the (table, plane, dim) index — a portable pseudo-random source both
    numpy and DuckDB evaluate identically (entry = +1 iff the top bit of
    the digest's first hex digit is set). Sign-random-projection LSH
    only needs symmetric i.i.d. plane entries; +/-1 entries keep every
    projection an exact int64 dot (order-free), unlike Gaussian floats
    whose BLAS-order sums are engine-specific. Constants, not data:
    regenerated per task in microseconds."""
    import hashlib

    import numpy as np

    e = np.empty((n_tables, n_planes, dims), dtype=np.int64)
    for t in range(n_tables):
        for p in range(n_planes):
            for d in range(dims):
                h = hashlib.sha256(f"srp_{t}_{p}_{d}".encode()).hexdigest()
                e[t, p, d] = 1 if int(h[0], 16) >= 8 else -1
    return e


def lsh_bucketed_ann(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """ANN via random-hyperplane (sign-bit) LSH.

    Stage 1 — signatures: a vectorized Pandas UDF computes, per vector,
    one n_planes-bit signature per table: bit p = sign(q . plane_tp),
    where q is the quantized vector and the planes are the portable
    +/-1 family of ``_srp_planes`` — an exact int64 einsum per Arrow
    batch (the textbook case where a Pandas UDF beats a Catalyst
    expression tree: a pure-expression version of this signature was
    measured at 14 MiB of codegen per task; the matmul is microseconds).
    Exact integer projections + portable planes mean the signatures —
    and therefore bucket membership, the operator's "approximate" part —
    are reproducible in SQL, so this ANN path carries a full DuckDB
    oracle (``lsh_bucketed_ann_oracle``) despite recall < 1.

    Stage 2 — bucket join: query and candidate vectors sharing a
    (table, signature) bucket are candidates; exact quantized-cosine
    re-rank inside candidates only (same arithmetic as cosine_topk).

    Recall is tunable: P(candidate) = 1-(1-(1-theta/pi)^planes)^tables,
    with floors pinned by tests/test_extensions.py.
    """
    sig_type = T.ArrayType(T.LongType())

    @F.pandas_udf(sig_type)
    def signatures(qcol: pd.Series) -> pd.Series:
        import numpy as np

        planes = _srp_planes(n_tables, n_planes, 64)
        mat = np.stack(qcol.to_numpy()).astype(np.int64)  # (batch, dims)
        out = []
        # (tables, planes, dims) x (batch, dims) -> bits -> packed ints
        proj = np.einsum("tpd,bd->btp", planes, mat) >= 0
        weights = 1 << np.arange(n_planes)
        packed = (proj * weights).sum(axis=2)  # (batch, tables)
        for row in packed:
            out.append(row.astype("int64"))
        return pd.Series(out)

    # pin ONE (tbl, sig) exchange below the query/candidate split: both
    # join branches differ only by their vec_id filter, so without the
    # shared exchange each branch re-executes the scan + signature
    # chain (measured: twice per run). REPARTITION_BY_NUM at the
    # session's shuffle width is AQE-exempt — the per-bucket codegen
    # re-rank above it then runs at bucket parallelism instead of the
    # one task AQE's byte-proportional model folds ~2 MB to — and is
    # exactly the width the bucket join's implicit exchange would have
    # had: width-neutral at scale. The signature UDF itself stays on
    # the scan's own splits (fanning a Python-facing stage wide opens
    # one Arrow worker channel per partition — measured net-negative on
    # narrow fixtures).
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    ).select(
        "vec_id", "q", signatures(F.col("q")).alias("sigs")
    ).withColumn("n2", _dot(F.col("q"), F.col("q")))
    tabled = base.select(
        "vec_id",
        "q",
        "n2",
        F.posexplode(F.col("sigs")).alias("tbl", "sig"),
    )
    tabled = tabled.repartition(
        shuffle_width(tabled), F.col("tbl"), F.col("sig")
    )
    # hot-bucket formulation (the dedup family's r4 idiom,
    # candidate_pairs_from_bands): ONE bucket aggregation with
    # conditional collect_lists, then array pair expansion — no join.
    # The query/candidate split as two filtered branches of a join
    # re-executed the scan + signature chain once per branch (Catalyst
    # pushes the complementary vec_id filters below any shared
    # exchange, splitting the canonical subtrees so runtime exchange
    # reuse never fires; measured twice per run). A single aggregation
    # computes the chain once by construction. collect_list drops the
    # NULLs the unmet `when` produces, so each bucket carries exactly
    # its query rows and candidate rows; pair expansion and the
    # (query_id, cand_id) dedup are unchanged semantics.
    bucketed = (
        tabled.groupBy("tbl", "sig")
        .agg(
            F.collect_list(
                F.when(
                    F.col("vec_id") < n_queries,
                    F.struct("vec_id", "q", "n2"),
                )
            ).alias("qs"),
            F.collect_list(
                F.when(
                    F.col("vec_id") >= n_queries,
                    F.struct("vec_id", "q", "n2"),
                )
            ).alias("cs"),
        )
        .filter((F.size("qs") > 0) & (F.size("cs") > 0))
    )
    pairs = (
        bucketed.select(F.explode("qs").alias("qr"), "cs")
        .select("qr", F.explode("cs").alias("cr"))
        .select(
            F.col("qr.vec_id").alias("query_id"),
            F.col("qr.q").alias("qv"),
            F.col("qr.n2").alias("qn2"),
            F.col("cr.vec_id").alias("cand_id"),
            F.col("cr.q").alias("cv"),
            F.col("cr.n2").alias("cn2"),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    dot = _dot(F.col("qv"), F.col("cv"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))
    )
    scored = pairs.select("query_id", "cand_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def lsh_bucketed_ann_oracle(
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> str:
    """DuckDB twin of ``lsh_bucketed_ann`` — the whole approximate
    pipeline in SQL. The +/-1 plane entries are regenerated from sha256
    of the (table, plane, dim) index (top bit of the first hex digit,
    the same rule ``_srp_planes`` applies), projections are exact int64
    sums of quantized components, signatures pack sign bits identically,
    and the bucket join + exact re-rank mirror the Spark stages — so
    bucket membership itself, not just the re-rank, matches bitwise."""
    quant = (
        "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * "
        f"{QUANT}) AS BIGINT))"
    )
    return f"""
        WITH norms AS (
            SELECT vec_id, q,
                   CAST(list_aggregate(list_transform(list_zip(q, q),
                        p -> p[1] * p[2]), 'sum') AS BIGINT) AS n2
            FROM (SELECT vec_id, {quant} AS q FROM embeddings)
        ),
        planes AS (
            SELECT t.t, p.p, d.d,
                   CASE WHEN strpos('0123456789abcdef',
                            substr(sha256('srp_' || t.t || '_' || p.p
                                          || '_' || d.d), 1, 1)) - 1 >= 8
                        THEN 1 ELSE -1 END AS e
            FROM range(0, {n_tables}) t(t),
                 range(0, {n_planes}) p(p),
                 range(0, 64) d(d)
        ),
        proj AS (
            SELECT n.vec_id, pl.t, pl.p,
                   SUM(pl.e * n.q[CAST(pl.d AS INT) + 1]) AS dot
            FROM norms n, planes pl
            GROUP BY n.vec_id, pl.t, pl.p
        ),
        sigs AS (
            SELECT vec_id, t AS tbl,
                   CAST(SUM(CASE WHEN dot >= 0
                            THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
                            ELSE 0 END) AS BIGINT) AS sig
            FROM proj GROUP BY vec_id, t
        ),
        tabled AS (
            SELECT s.vec_id, s.tbl, s.sig, n.q, n.n2
            FROM sigs s JOIN norms n USING (vec_id)
        ),
        pairs AS (
            SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS cand_id
            FROM tabled qs JOIN tabled cs USING (tbl, sig)
            WHERE qs.vec_id < {n_queries} AND cs.vec_id >= {n_queries}
        ),
        scored AS (
            SELECT p.query_id, p.cand_id,
                   CAST(CAST(list_aggregate(list_transform(
                            list_zip(qn.q, cn.q), z -> z[1] * z[2]),
                            'sum') AS BIGINT) AS DOUBLE)
                   / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
                       AS cosine
            FROM pairs p
            JOIN norms qn ON qn.vec_id = p.query_id
            JOIN norms cn ON cn.vec_id = p.cand_id
        )
        SELECT query_id, cand_id, cosine, rank
        FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, cand_id ASC
                   ) AS rank
            FROM scored
        )
        WHERE rank <= {k}
    """


def gemm_self_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    block_size: int = 1024,
    expected_rows: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine top-k over a set of integer-quantized
    vectors (``vec_col``: array<long>), GEMM-tiled.

    Rows group into blocks of ``block_size``; unordered block pairs
    cross-join (upper triangle, small side broadcast) and each pair runs
    ONE dense numpy matmul emitting per-row top-k candidates in BOTH
    directions; a final window keeps the global top-k. Bit-exact (the
    embedding_near_dups argument: integer-valued float64 products and
    sums stay below 2^53, so any summation order gives the same dots;
    the normalization is the same IEEE op sequence as the oracle).

    Scale: this is the exact tier — O((n/b)^2) block pairs. Intended for
    n up to ~10^5 (the payload replicates once per block, ~b copies);
    larger fleets route through :func:`lsh_self_topk`.
    """
    import numpy as np

    # deterministic dense block ids: row_number over id order, div
    # block_size (a single-partition sort — bounded by the exact-tier
    # fleet cap, so the driver never sees the payload and the sort is
    # tens of MB at most)
    w_all = Window.orderBy("sid")
    base = (
        vectors.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("sv"))
        .withColumn("rn", F.row_number().over(w_all) - 1)
        .withColumn("block", F.expr(f"rn DIV {block_size}"))
        .drop("rn")
    )
    # ``expected_rows`` (a cardinality hint, exactness never affects
    # results — only stage width) sizes an AQE-exempt hash(block)
    # exchange to the true block count, so the per-block-pair matmul +
    # lexsort stage runs at block parallelism instead of the ONE task
    # AQE's byte-proportional model folds this ~1 MB exchange to
    # (measured 0.86 s single-task at sf0.1). Capped at the session
    # shuffle width; never wider than the blocks themselves — an empty
    # partition under a Python-facing stage still opens an Arrow worker
    # channel, which is why a blanket width-32 pin measured SLOWER than
    # single-task on fixture fleets. Without a hint the plan is left to
    # AQE (single-task GEMM — fine for small fleets, the no-hint case).
    if expected_rows is not None:
        n_blocks = max(1, -(-expected_rows // block_size))
        width = min(shuffle_width(base), n_blocks)
        if width > 1:
            base = base.repartition(width, F.col("block"))
    grouped = base.groupBy("block").agg(
        F.collect_list(F.struct("sid", "sv")).alias("rows")
    )
    pairs = (
        grouped.alias("a")
        .join(F.broadcast(grouped.alias("b")), F.col("a.block") <= F.col("b.block"))
        .select(
            F.col("a.block").alias("block_a"),
            F.col("b.block").alias("block_b"),
            F.col("a.rows").alias("rows_a"),
            F.col("b.rows").alias("rows_b"),
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def topk_directed(ids_a, qa, na, ids_b, qb, nb, same_block):
        """Per-row-of-a local top-k against block b. Returns index pairs."""
        dots = qa @ qb.T
        cos = dots / (na[:, None] * nb[None, :])
        if same_block:
            np.fill_diagonal(cos, -np.inf)
        # per row: order by (-cos, id_b) and keep k
        order = np.lexsort((ids_b[None, :].repeat(len(ids_a), 0), -cos), axis=1)
        keep = order[:, : min(k, cos.shape[1])]
        ia = np.repeat(np.arange(len(ids_a)), keep.shape[1])
        ib = keep.ravel()
        mask = np.isfinite(cos[ia, ib])
        return ia[mask], ib[mask], cos[ia[mask], ib[mask]]

    def block_topk(batches):
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for block_a, block_b, rows_a, rows_b in zip(
                pdf["block_a"], pdf["block_b"], pdf["rows_a"], pdf["rows_b"]
            ):
                ids_a = np.array([r["sid"] for r in rows_a], dtype=np.int64)
                ids_b = np.array([r["sid"] for r in rows_b], dtype=np.int64)
                qa = np.array([r["sv"] for r in rows_a], dtype=np.float64)
                qb = np.array([r["sv"] for r in rows_b], dtype=np.float64)
                na = np.sqrt((qa * qa).sum(axis=1))
                nb = np.sqrt((qb * qb).sum(axis=1))
                same = block_a == block_b
                ia, ib, c = topk_directed(ids_a, qa, na, ids_b, qb, nb, same)
                out_a.extend(ids_a[ia])
                out_b.extend(ids_b[ib])
                out_c.extend(c)
                if not same:  # reverse direction: b's candidates from a
                    ib2, ia2, c2 = topk_directed(
                        ids_b, qb, nb, ids_a, qa, na, False
                    )
                    out_a.extend(ids_b[ib2])
                    out_b.extend(ids_a[ia2])
                    out_c.extend(c2)
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    partial = pairs.mapInPandas(block_topk, schema=out_schema)
    w = Window.partitionBy("id_a").orderBy(
        F.col("cosine").desc(), F.col("id_b").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "cosine", "rank")
    )


def lsh_self_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dims: int,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Approximate all-pairs cosine top-k (every row is both query and
    candidate) via sign-bit LSH — the fleet-scale tier of
    :func:`gemm_self_topk`. Bucket join on (table, signature), exact
    quantized-cosine re-rank inside candidate pairs only. Shuffles
    8-byte signatures, not payloads; candidate volume is sub-quadratic
    for clustered inputs. Recall < 1 by design (pinned by tests)."""
    sig_type = T.ArrayType(T.LongType())

    @F.pandas_udf(sig_type)
    def signatures(vec: pd.Series) -> pd.Series:
        import numpy as np

        planes = _plane_matrix(n_tables, n_planes, dims)
        mat = np.stack(vec.to_numpy()).astype(np.float64)
        proj = np.einsum("tpd,bd->btp", planes, mat) >= 0
        weights = 1 << np.arange(n_planes)
        packed = (proj * weights).sum(axis=2)
        return pd.Series([row.astype("int64") for row in packed])

    base = vectors.select(
        F.col(id_col).alias("sid"),
        F.col(vec_col).alias("sv"),
        signatures(F.col(vec_col)).alias("sigs"),
    ).withColumn("n2", _dot(F.col("sv"), F.col("sv")))
    tabled = base.select(
        "sid", "sv", "n2", F.posexplode(F.col("sigs")).alias("tbl", "sig")
    )
    a = tabled.select(
        F.col("sid").alias("id_a"),
        F.col("sv").alias("va"),
        F.col("n2").alias("na"),
        "tbl",
        "sig",
    )
    b = tabled.select(
        F.col("sid").alias("id_b"),
        F.col("sv").alias("vb"),
        F.col("n2").alias("nb"),
        "tbl",
        "sig",
    )
    cand = (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("id_a") != F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = _dot(F.col("va"), F.col("vb")).cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    scored = cand.select("id_a", "id_b", cos.alias("cosine"))
    w = Window.partitionBy("id_a").orderBy(
        F.col("cosine").desc(), F.col("id_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "cosine", "rank")
    )


#: float-error safety margin for the block-pair angular bound: the bound
#: arithmetic (normalize, acos, cos) accrues < 1e-12 of rounding in
#: 64-dim; 1e-6 is a million-fold margin that still prunes effectively.
_BOUND_MARGIN = 1e-6


def _blocked_vectors(
    embeddings: DataFrame,
    block_size: int,
    sort_by_signature: bool,
    expected_rows: int | None = None,
) -> DataFrame:
    """(block, rows, centroid, radius): vectors grouped into GEMM tiles
    with an exact per-block angular summary.

    ``sort_by_signature`` assigns blocks by a coarse 16-bit sign-LSH
    signature order so angularly-close vectors share a block — that is
    what makes the centroid-bound prefilter bite on clustered corpora.
    (The global row_number sort is the simple form; at 100 TB replace
    with a range-partitioned zipWithIndex — same block semantics.)"""
    import numpy as np

    sig_type = T.LongType()

    @F.pandas_udf(sig_type)
    def signature16(emb: pd.Series) -> pd.Series:
        planes = _plane_matrix(1, 16, 64)[0]  # (16, dims)
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        bits = (mat @ planes.T) >= 0
        return pd.Series((bits * (1 << np.arange(16))).sum(axis=1).astype("int64"))

    # NOT fanned out (r12, measured): every stage of this chain is
    # Python-facing (pandas UDF signatures, mapInPandas summarize/GEMM),
    # and an explicit-width repartition makes each such stage open one
    # Arrow worker channel per partition — mostly for EMPTY partitions
    # at fixture block counts (17.9 s of task time, 0.38 s of CPU at
    # width 32). The single-task form is bounded by block count, which
    # the exact-tier cap already bounds; AQE's coalescing is the right
    # behavior for Python-facing stages at this scale.
    base = embeddings.select(
        "vec_id",
        _quantized(F.col("embedding")).alias("q"),
        signature16(F.col("embedding")).alias("sig"),
    )
    order = ("sig", "vec_id") if sort_by_signature else ("vec_id",)
    w = Window.orderBy(*order)
    blocked = (
        base.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("block", F.expr(f"rn DIV {block_size}"))
        .drop("rn", "sig")
    )
    # ``expected_rows`` (cardinality hint; never affects results, only
    # stage width — the gemm_self_topk pattern): size an AQE-exempt
    # hash(block) exchange to the TRUE block count so the summarize
    # mapInPandas (and, through the broadcast join above it, the GEMM
    # stage) runs at block parallelism instead of the one task AQE's
    # byte-model folds this small exchange to. Capped at min(shuffle
    # width, n_blocks): every pinned partition is data-bearing, which is
    # the rule for Python-facing stages (an EMPTY partition still opens
    # an Arrow worker channel — the r12 negative result that reverted a
    # blanket width-32 pin here). The >= 4 floor is measured (r13,
    # interleaved min-of-4 at 64 dims): 2 blocks is a wash (the exchange
    # + extra Arrow channels cost what 2-way GEMM parallelism buys);
    # 4/8/16 blocks win -16%/-22%/-55%.
    if expected_rows is not None:
        n_blocks = max(1, -(-expected_rows // block_size))
        width = min(shuffle_width(blocked), n_blocks)
        if width >= 4:
            blocked = blocked.repartition(width, F.col("block"))
    grouped = blocked.groupBy("block").agg(
        F.collect_list(F.struct("vec_id", "q")).alias("rows")
    )

    summary_schema = T.StructType(
        [
            T.StructField("block", T.LongType()),
            T.StructField("rows", grouped.schema["rows"].dataType),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
            T.StructField("radius", T.DoubleType()),
        ]
    )

    def summarize(batches):
        for pdf in batches:
            cents, radii = [], []
            for rows in pdf["rows"]:
                q = np.array([r["q"] for r in rows], dtype=np.float64)
                unit = q / np.linalg.norm(q, axis=1, keepdims=True)
                c = unit.mean(axis=0)
                cn = np.linalg.norm(c)
                if cn == 0.0:  # degenerate: antipodal block — no pruning
                    cents.append(np.zeros(q.shape[1]))
                    radii.append(np.pi)
                    continue
                c = c / cn
                cosines = np.clip(unit @ c, -1.0, 1.0)
                cents.append(c)
                radii.append(float(np.arccos(cosines).max()))
            yield pd.DataFrame(
                {
                    "block": pdf["block"],
                    "rows": pdf["rows"],
                    "centroid": cents,
                    "radius": radii,
                }
            )

    return grouped.mapInPandas(summarize, schema=summary_schema)


def candidate_block_pairs(
    embeddings: DataFrame,
    threshold: float,
    block_size: int = 1024,
    sort_by_signature: bool = True,
    prefilter: bool = True,
    expected_rows: int | None = None,
) -> DataFrame:
    """Block pairs that can possibly contain a cosine >= threshold pair.

    Sound pruning (never drops a qualifying pair): for blocks A, B with
    centroid angle θ and angular radii r_A, r_B, every cross pair has
    angle >= θ - r_A - r_B (spherical triangle inequality), so the pair
    is skipped only when cos(max(θ - r_A - r_B, 0)) < threshold minus a
    float-safety margin. Exactness of the final result is therefore
    independent of the prefilter; only the fan-out shrinks."""
    blocks = _blocked_vectors(
        embeddings, block_size, sort_by_signature, expected_rows
    )
    a = blocks.alias("a")
    b = blocks.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.block") <= F.col("b.block"))
    if prefilter:
        dot_c = F.aggregate(
            F.zip_with(F.col("a.centroid"), F.col("b.centroid"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        theta = F.acos(F.least(F.greatest(dot_c, F.lit(-1.0)), F.lit(1.0)))
        gap = F.greatest(
            theta - F.col("a.radius") - F.col("b.radius"), F.lit(0.0)
        )
        upper = F.cos(gap)
        pairs = pairs.filter(upper >= F.lit(threshold - _BOUND_MARGIN))
    return pairs.select(
        F.col("a.block").alias("block_a"),
        F.col("b.block").alias("block_b"),
        F.col("a.rows").alias("rows_a"),
        F.col("b.rows").alias("rows_b"),
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    block_size: int = 1024,
    sort_by_signature: bool = True,
    prefilter: bool = True,
    expected_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector tier of the
    dedup suite (text tiers live in functions/dedup.py).

    Block-tiled exact search with a sound angular prefilter: vectors
    group into signature-sorted blocks of ``block_size``; block pairs
    that provably cannot reach ``threshold`` are pruned by the
    centroid/radius bound (:func:`candidate_block_pairs` — triangle
    inequality, never a false dismissal); surviving pairs compute one
    dense numpy matmul each inside mapInPandas. On clustered corpora
    the surviving-pair count approaches linear in blocks; on adversarial
    (uniform) corpora it degrades gracefully to all pairs — still the
    GEMM-tiled design, never per-pair Catalyst folds (measured 20x
    slower at sf0.1).

    Bit-exact vs the DuckDB oracle regardless of the prefilter:
    quantized integer components make every dot product an
    exactly-representable integer in float64 (sums of integers < 2^53
    are exact in ANY summation order, so BLAS reordering cannot change
    the result), and the cosine normalization is the same IEEE op
    sequence both engines use.
    """
    import numpy as np

    pairs = candidate_block_pairs(
        embeddings, threshold, block_size, sort_by_signature, prefilter,
        expected_rows,
    ).select("block_a", "block_b", "rows_a", "rows_b")
    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def block_matmul(batches):
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for block_a, block_b, rows_a, rows_b in zip(
                pdf["block_a"], pdf["block_b"], pdf["rows_a"], pdf["rows_b"]
            ):
                ids_a = np.array([r["vec_id"] for r in rows_a], dtype=np.int64)
                ids_b = np.array([r["vec_id"] for r in rows_b], dtype=np.int64)
                qa = np.array([r["q"] for r in rows_a], dtype=np.float64)
                qb = np.array([r["q"] for r in rows_b], dtype=np.float64)
                dots = qa @ qb.T  # exact: integer values, < 2^53
                na = np.sqrt((qa * qa).sum(axis=1))
                nb = np.sqrt((qb * qb).sum(axis=1))
                cos = dots / (na[:, None] * nb[None, :])
                # signature-sorted blocks no longer order ids across
                # blocks: emit each unordered pair once, normalized to
                # (min, max). Same-block pairs use the strict upper
                # triangle; cross-block pairs appear in exactly one
                # block pair, any id order.
                if block_a == block_b:
                    keep = ids_a[:, None] < ids_b[None, :]
                else:
                    keep = np.ones_like(cos, dtype=bool)
                ia, ib = np.where(keep & (cos >= threshold))
                lo = np.minimum(ids_a[ia], ids_b[ib])
                hi = np.maximum(ids_a[ia], ids_b[ib])
                out_a.extend(lo)
                out_b.extend(hi)
                out_c.extend(cos[ia, ib])
            yield pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "cosine": out_c})

    return pairs.mapInPandas(block_matmul, schema=out_schema)


def embedding_near_dups_oracle(threshold: float = 0.9) -> str:
    quant = (
        "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * "
        f"{QUANT}) AS BIGINT))"
    )
    return f"""
        WITH norms AS (
            SELECT vec_id, {quant} AS q,
                   CAST(list_aggregate(list_transform(list_zip({quant}, {quant}),
                        p -> p[1] * p[2]), 'sum') AS BIGINT) AS n2
            FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(CAST(list_aggregate(list_transform(list_zip(a.q, b.q),
                    p -> p[1] * p[2]), 'sum') AS BIGINT) AS DOUBLE)
               / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        FROM norms a JOIN norms b ON a.vec_id < b.vec_id
        WHERE CAST(CAST(list_aggregate(list_transform(list_zip(a.q, b.q),
                    p -> p[1] * p[2]), 'sum') AS BIGINT) AS DOUBLE)
               / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
              >= {threshold}
    """


# --- IVF (inverted-file) ANN — the coarse-quantizer scale path ----------------


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    assignment: str = "exact",
) -> DataFrame:
    """IVF ANN: partition the vector space by nearest-centroid (coarse
    quantizer), search only the ``n_probe`` closest inverted lists per
    query.

    Centroids are a deterministic hash-selected sample of the corpus
    (the ``n_centroids`` vectors minimizing sha256(vec_id) — a uniform
    sample, stable on any layout and reproducible by DuckDB; a
    production build would k-means-refine them, the plumbing is
    identical).

    List assignment has two tiers:

    - ``exact`` (default): rank centroids by the same quantized-integer
      cosine the re-rank stage uses — a broadcast join of the tiny
      centroid table, all inside codegen (no Arrow transfer). Every
      arithmetic step is exact or correctly-rounded-identical across
      engines, which makes the *entire* ANN result — probe lists,
      candidate set, scores, ranking — bitwise reproducible in SQL:
      this approximate operator carries a full DuckDB oracle. Cost:
      each row scores n_centroids dots, fine up to a few hundred
      centroids.
    - ``gemm``: one vectorized numpy matmul per Arrow batch against the
      collected centroid matrix — the throughput tier when n_centroids
      is large (thousands), at the price of BLAS-order float sums
      (per-engine, not oracle-comparable). Same plumbing, same output
      schema, recall pinned in tests.

    Scale: candidate cost drops to ~n_probe/n_centroids of brute force;
    recall depends on how clustered the corpus is (pinned in tests
    against brute force). Output schema matches cosine_topk.
    """
    # deterministic centroid choice, portable hash family
    cent_rows = (
        embeddings.select(
            "vec_id",
            "embedding",
            F.sha2(F.col("vec_id").cast("string"), 256).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(n_centroids)
    )

    if assignment == "exact":
        # every row scores n_centroids 64-dim integer dots in codegen —
        # spread the narrow fixture scan first (no-op at scale); the
        # shared helper stays untouched for its streaming/store callers
        ranked = _centroid_ranked(fan_out_scan(embeddings, "vec_id"), cent_rows)
        cands = ranked.filter(
            (F.col("vec_id") >= n_queries) & (F.col("crank") == 1)
        ).select(
            F.col("vec_id").alias("cand_id"),
            F.col("q").alias("cv"),
            F.col("n2").alias("cn2"),
            F.col("cent_vid").alias("lst"),
        )
        queries = ranked.filter(
            (F.col("vec_id") < n_queries) & (F.col("crank") <= n_probe)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qv"),
            F.col("n2").alias("qn2"),
            F.col("cent_vid").alias("lst"),
        )
        return _ivf_rerank(queries, cands, k)
    if assignment != "gemm":  # pragma: no cover - guarded API
        raise ValueError(f"unknown assignment: {assignment!r}")

    import numpy as np

    from pyspark.sql import types as T

    cents_collected = cent_rows.collect()
    cent_mat = np.array(
        [r["embedding"] for r in cents_collected], dtype=np.float64
    )
    cent_norm = cent_mat / np.linalg.norm(cent_mat, axis=1, keepdims=True)

    assign_type = T.ArrayType(T.IntegerType())

    @F.pandas_udf(assign_type)
    def nearest_lists(emb: pd.Series) -> pd.Series:
        import numpy as np  # noqa: F811

        mat = np.stack(emb.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ cent_norm.T
        order = np.argsort(-sims, axis=1)
        return pd.Series(list(order[:, :n_probe].astype("int32")))

    base = embeddings.select(
        "vec_id",
        _quantized(F.col("embedding")).alias("q"),
        nearest_lists(F.col("embedding")).alias("lists"),
    ).withColumn("n2", _dot(F.col("q"), F.col("q")))

    # candidates live in their single nearest list; queries probe n_probe
    cands = base.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("cand_id"),
        F.col("q").alias("cv"),
        F.col("n2").alias("cn2"),
        F.element_at(F.col("lists"), 1).alias("lst"),
    )
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("n2").alias("qn2"),
        F.explode(F.col("lists")).alias("lst"),
    )
    return _ivf_rerank(queries, cands, k)


def ivf_topk_oracle(
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> str:
    """DuckDB twin of ``ivf_topk(assignment="exact")`` — the *whole*
    approximate pipeline replayed in SQL: same sha256-minimizer
    centroids, same quantized-integer centroid ranking with the same
    (cosine DESC, cent_vid ASC) tiebreak, same single-list candidates /
    n_probe query lists, same exact re-rank. Every comparison is between
    doubles both engines derive identically from exact integers (casts
    exact, sqrt/division/multiply correctly rounded), so even probe-list
    membership — the "approximate" part — matches bitwise."""
    quant = (
        "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * "
        f"{QUANT}) AS BIGINT))"
    )

    def dot(a: str, b: str) -> str:
        return (
            f"CAST(list_aggregate(list_transform(list_zip({a}, {b}),"
            " p -> p[1] * p[2]), 'sum') AS BIGINT)"
        )

    def cos(d: str, n2a: str, n2b: str) -> str:
        return (
            f"(CAST({d} AS DOUBLE)"
            f" / (sqrt(CAST({n2a} AS DOUBLE)) * sqrt(CAST({n2b} AS DOUBLE))))"
        )

    return f"""
        WITH norms AS (
            SELECT vec_id, q, {dot('q', 'q')} AS n2
            FROM (SELECT vec_id, {quant} AS q FROM embeddings)
        ),
        cents AS (
            SELECT vec_id AS cent_vid, q AS cq, n2 AS cn2
            FROM norms
            ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {n_centroids}
        ),
        ranked AS (
            SELECT v.vec_id, v.q, v.n2, c.cent_vid,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cos(dot('v.q', 'c.cq'), 'v.n2', 'c.cn2')}
                                DESC, c.cent_vid ASC
                   ) AS crank
            FROM norms v, cents c
        ),
        cands AS (
            SELECT vec_id AS cand_id, q AS cv, n2 AS cn2, cent_vid AS lst
            FROM ranked WHERE vec_id >= {n_queries} AND crank = 1
        ),
        queries AS (
            SELECT vec_id AS query_id, q AS qv, n2 AS qn2, cent_vid AS lst
            FROM ranked WHERE vec_id < {n_queries} AND crank <= {n_probe}
        ),
        scored AS (
            SELECT qs.query_id, cs.cand_id,
                   {cos(dot('qs.qv', 'cs.cv'), 'qs.qn2', 'cs.cn2')} AS cosine
            FROM queries qs JOIN cands cs USING (lst)
        )
        SELECT query_id, cand_id, cosine, rank
        FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, cand_id ASC
                   ) AS rank
            FROM scored
        )
        WHERE rank <= {k}
    """


def _centroid_ranked(embeddings: DataFrame, cent_rows: DataFrame) -> DataFrame:
    """Exact-tier centroid ranking shared by ``ivf_topk`` and
    ``ivf_pq_topk``: every vector scored against the broadcast centroid
    table by the quantized-integer cosine, ranked per vector
    (``crank`` 1 = nearest list). All codegen, no Arrow."""
    cents = cent_rows.select(
        F.col("vec_id").alias("cent_vid"),
        _quantized(F.col("embedding")).alias("cq"),
    ).withColumn("cn2", _dot(F.col("cq"), F.col("cq")))
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    ).withColumn("n2", _dot(F.col("q"), F.col("q")))
    cent_cos = _dot(F.col("q"), F.col("cq")).cast("double") / (
        F.sqrt(F.col("n2").cast("double"))
        * F.sqrt(F.col("cn2").cast("double"))
    )
    return (
        base.join(F.broadcast(cents))
        .select("vec_id", "q", "n2", "cent_vid", cent_cos.alias("ccos"))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("ccos").desc(), F.col("cent_vid").asc()
                )
            ),
        )
    )


def _coarse_centroids(
    embeddings: DataFrame, n_centroids: int, refine_iters: int = 0
) -> DataFrame:
    """(vec_id, embedding) coarse-quantizer rows for IVF routing.

    Initialization is the deterministic sha256-minimizer corpus sample
    every IVF operator here uses (layout-stable, partition-invariant).
    ``refine_iters`` runs that many Lloyd iterations on the WHOLE
    vectors in the router's own metric: every corpus vector is
    assigned exactly as ``_centroid_ranked`` will route it (max
    quantized cosine, cent_vid tiebreak), then each centroid moves to
    the element-wise integer mean (``sum DIV count`` on the quantized
    grid — exact longs, bitwise partition-invariant) of its assigned
    vectors; a centroid that attracted nothing keeps its previous
    value. Refined centroids are stored as ``mean / QUANT`` doubles,
    which ``_quantized`` recovers bit-exactly, so routing stays on the
    integer grid end-to-end.

    Why it matters at scale: the raw sample puts centroids wherever
    the corpus is dense, so at real ``n_centroids`` (>= 256 at 100 TB)
    inverted lists go unbalanced and the ``n_probe/n_centroids`` scan
    fraction stops holding — the hottest list dominates every probe.
    One or two Lloyd passes (each one corpus scan against a broadcast
    centroid table) pull centroids apart and flatten the list
    histogram (measured in tools/scale_probe.py; SCALE.md). Keeps each
    sampled vec_id as the stable centroid/list id."""
    cents = (
        embeddings.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.sha2(F.col("vec_id").cast("string"), 256).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(n_centroids)
        .select("vec_id", "embedding")
    )
    if refine_iters <= 0:
        return cents
    from ..blocks import release_local_checkpoint

    cents = cents.localCheckpoint(eager=True)
    for _ in range(refine_iters):
        assigned = _centroid_ranked(embeddings, cents).filter(
            F.col("crank") == 1
        )
        means = (
            assigned.select("cent_vid", F.posexplode("q").alias("pos", "v"))
            .groupBy("cent_vid", "pos")
            .agg(F.expr("sum(v) DIV count(1)").alias("cv"))
        )
        new_emb = means.groupBy("cent_vid").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("cv")))
                ),
                lambda p: p["cv"].cast("double") / F.lit(QUANT),
            ).alias("emb_new")
        )
        prev = cents
        cents = (
            prev.join(
                new_emb, prev["vec_id"] == new_emb["cent_vid"], "left"
            )
            .select(
                "vec_id", F.coalesce("emb_new", "embedding").alias("embedding")
            )
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(prev)
    return cents


def _ivf_rerank(queries: DataFrame, cands: DataFrame, k: int) -> DataFrame:
    """Exact quantized-cosine re-rank of probed candidates (shared by
    both assignment tiers)."""
    dot = _dot(F.col("qv"), F.col("cv"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))
    )
    scored = (
        queries.join(cands, "lst")
        .select("query_id", "cand_id", cos.alias("cosine"))
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


# --- product quantization (ADC candidate generation) -------------------------


def _sub_rows(embeddings: DataFrame, m: int, dims: int) -> DataFrame:
    """(vec_id, s, x): the corpus split into quantized sub-vectors, one
    row per (vector, subspace) — the working representation shared by
    the encoder and the codebook refiner."""
    sub = dims // m
    return embeddings.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        _quantized(
                            F.slice(F.col("embedding"), s * sub + 1, sub)
                        ).alias("x"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("sx"),
    ).select("vec_id", F.col("sx.s").alias("s"), F.col("sx.x").alias("x"))


def _lloyd_step(sub_rows: DataFrame, cb: DataFrame) -> DataFrame:
    """One Lloyd iteration per subspace, in the codebook's own
    assignment metric: every sub-vector is assigned to its best
    codeword exactly as ``pq_encode`` will assign it (max inner
    product, code_id tiebreak), then each (s, code_id) cell's codeword
    moves to the element-wise mean of its assigned sub-vectors —
    integer mean (``sum DIV count`` per dimension: exact longs, so the
    step is bitwise partition-invariant). Codewords that attracted
    nothing keep their previous value (the empty-cluster rule)."""
    scored = sub_rows.join(F.broadcast(cb), "s").withColumn(
        "ip", _dot(F.col("x"), F.col("cw"))
    )
    w = Window.partitionBy("vec_id", "s").orderBy(
        F.col("ip").desc(), F.col("code_id").asc()
    )
    assigned = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("s", "code_id", "x")
    )
    means = (
        assigned.select(
            "s", "code_id", F.posexplode("x").alias("pos", "v")
        )
        .groupBy("s", "code_id", "pos")
        .agg(F.expr("sum(v) DIV count(1)").alias("cv"))
    )
    new_cw = means.groupBy("s", "code_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("cv")))),
            lambda p: p["cv"],
        ).alias("cw_new")
    )
    return cb.join(new_cw, ["s", "code_id"], "left").select(
        "code_id", "s", F.coalesce("cw_new", "cw").alias("cw")
    )


def _pq_codebook(
    embeddings: DataFrame,
    m: int,
    ks: int,
    dims: int,
    refine_iters: int = 0,
) -> DataFrame:
    """(s, code_id, cw) codebook. Initialization: codeword ``code_id``
    of subspace ``s`` is the s-th slice of the ``code_id``-th
    sha256-minimizer-sampled corpus vector (the same deterministic,
    layout-stable sampling as the IVF coarse centroids). Quantized to
    exact integers like every similarity operator here.

    ``refine_iters`` runs that many Lloyd iterations per subspace on
    top of the sample (:func:`_lloyd_step`): each iteration is one
    corpus pass — broadcast-codebook assignment + a tiny
    (m·ks·sub)-row mean aggregation, the identical join machinery the
    encoder itself uses — and the refined codebook stays deterministic
    and partition-invariant (integer means, fixed tiebreaks). The
    (tiny) codebook is checkpointed per iteration so the lineage stays
    flat. 0 keeps the plain sampled codebook (the r3 behavior)."""
    sub = dims // m
    sample = (
        embeddings.select(
            "vec_id",
            "embedding",
            F.sha2(F.col("vec_id").cast("string"), 256).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(ks)
        .withColumn(
            "code_id",
            F.row_number().over(Window.orderBy("h", "vec_id")) - 1,
        )
    )
    cb = sample.select(
        "code_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        _quantized(
                            F.slice(F.col("embedding"), s * sub + 1, sub)
                        ).alias("cw"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("sc"),
    ).select("code_id", F.col("sc.s").alias("s"), F.col("sc.cw").alias("cw"))
    if refine_iters > 0:
        from ..blocks import release_local_checkpoint

        rows = _sub_rows(embeddings, m, dims)
        for _ in range(refine_iters):
            prev = cb
            cb = _lloyd_step(rows, cb).localCheckpoint(eager=True)
            # the superseded iteration's blocks feed nothing once the
            # new checkpoint is eager-materialized (no-op on the
            # initial sampled codebook, which is not a checkpoint)
            release_local_checkpoint(prev)
    return cb


def pq_encode(
    embeddings: DataFrame,
    m: int = 8,
    ks: int = 16,
    dims: int = 64,
    codebook: DataFrame | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """Product-quantize the corpus: (vec_id, codes ARRAY<INT>) where
    ``codes[s]`` is the nearest codeword (max inner product, exact
    integer arithmetic, code_id tiebreak) of subspace ``s``.

    This is the 100 TB storage story: a 64-dim float vector (256 B)
    compresses to ``m`` small ints (8 B at m=8) — the at-rest /
    shuffle-time representation for candidate generation, with exact
    vectors fetched only for the final re-rank sliver. All Catalyst:
    slice explode -> broadcast codebook join -> per-(vec, s) ranking.

    ``codebook`` lets a caller that already built the codebook (pq_topk,
    or an incremental encoder reusing a persisted one) pass it in; by
    default it is derived from ``embeddings`` itself, with
    ``refine_iters`` Lloyd iterations (see :func:`_pq_codebook`)."""
    cb = (
        codebook
        if codebook is not None
        else _pq_codebook(embeddings, m, ks, dims, refine_iters)
    )
    sub_rows = _sub_rows(embeddings, m, dims)
    scored = sub_rows.join(F.broadcast(cb), "s").withColumn(
        "ip", _dot(F.col("x"), F.col("cw"))
    )
    w = Window.partitionBy("vec_id", "s").orderBy(
        F.col("ip").desc(), F.col("code_id").asc()
    )
    best = scored.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") == 1
    )
    return best.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("s"), F.col("code_id")))
            ),
            lambda sc: sc["code_id"],
        ).alias("codes")
    )


def pq_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    dims: int = 64,
    rerank: int | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """PQ-ADC top-k: asymmetric-distance candidate generation over
    ``m``-byte codes, exact-cosine re-rank of the top ``rerank``
    sliver. Output schema matches :func:`cosine_topk`.

    Per query, the inner product against a candidate is approximated by
    table lookups: ``adc(q, c) ≈ Σ_s T_q[s][codes_c[s]]`` where
    ``T_q[s][j] = <q_s, codeword_j^s>`` (built by one broadcast-codebook
    join per query vector — ``m·ks`` exact integer dots). The ADC scan
    then costs m array lookups per (query, candidate) instead of a
    ``dims``-wide dot, and — the real 100 TB win — the candidate side
    moves 8-byte codes, not 256-byte vectors. IVF routing composes in
    front (restrict the scan to probed lists); the exact re-rank joins
    full vectors for the top-``rerank`` sliver only.

    Approximation quality: exact for any candidate whose sub-vectors
    coincide with its codewords; otherwise a quantization-error-bounded
    inner product. Recall vs brute-force cosine is pinned in tests on
    the fixture corpus. ``adc`` ranking is by approximate inner product
    (not cosine): candidate norms are nearly constant on this corpus —
    where they are not, store ``n2`` beside the codes and rank
    ``adc/sqrt(n2)`` instead (same plan shape).
    """
    if rerank is None:
        rerank = 4 * k
    sub = dims // m
    # one codebook, shared with the encode (the sampling is
    # deterministic, but sharing the frame makes the coupling
    # structural rather than coincidental — and saves a second
    # sha2-order sample scan); queries are filtered out BEFORE
    # encoding so their codes are never computed just to be dropped.
    cb = _pq_codebook(embeddings, m, ks, dims, refine_iters)
    codes = pq_encode(
        embeddings.filter(F.col("vec_id") >= n_queries),
        m,
        ks,
        dims,
        codebook=cb,
    )
    tables = _pq_query_tables(embeddings, n_queries, cb, m, dims)
    # ADC scan: broadcast the (tiny) query tables against the code scan
    scored = codes.join(F.broadcast(tables)).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        _pq_adc(F.col("t"), F.col("codes")).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("cand_id").asc()
    )
    shortlist = scored.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= rerank
    ).select("query_id", "cand_id")
    return _exact_rerank_pairs(shortlist, embeddings, k)


def _pq_query_tables(
    embeddings: DataFrame,
    n_queries: int,
    cb: DataFrame,
    m: int,
    dims: int,
) -> DataFrame:
    """(query_id, t) ADC tables for the first ``n_queries`` corpus
    vectors — the inline operators' query convention; delegates to
    :func:`query_adc_tables`."""
    return query_adc_tables(
        embeddings.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        cb,
        m,
        dims,
    )


def query_adc_tables(
    queries: DataFrame,
    cb: DataFrame,
    m: int,
    dims: int,
) -> DataFrame:
    """(query_id, t) per-query ADC tables from a standalone
    (query_id, embedding) frame: ``t[s][code]`` is the exact integer
    inner product of the query's s-th sub-vector with codeword ``code``
    — array-of-array ordered positionally by (s, code_id), one
    broadcast codebook join to build. Shared by the inline PQ operators
    and the persisted ANN index (functions/ann_store.py)."""
    sub = dims // m
    q_sub = queries.select(
        F.col("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        _quantized(
                            F.slice(F.col("embedding"), s * sub + 1, sub)
                        ).alias("qx"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("sq"),
    ).select("query_id", F.col("sq.s").alias("s"), F.col("sq.qx").alias("qx"))
    tbl_rows = (
        q_sub.join(F.broadcast(cb), "s")
        .withColumn("d", _dot(F.col("qx"), F.col("cw")))
        .groupBy("query_id", "s")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("code_id"), F.col("d")))
                ),
                lambda cd: cd["d"],
            ).alias("row")
        )
    )
    return tbl_rows.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("s"), F.col("row")))),
            lambda sr: sr["row"],
        ).alias("t")
    )


def _pq_adc(t_col: Column, codes_col: Column) -> Column:
    """ADC score: Σ_s t[s][codes[s]] — m positional lookups."""
    return F.aggregate(
        F.zip_with(t_col, codes_col, lambda row, c: F.element_at(row, c + 1)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _exact_rerank_pairs(
    shortlist: DataFrame,
    embeddings: DataFrame,
    k: int,
    query_embeddings: DataFrame | None = None,
) -> DataFrame:
    """Exact quantized-cosine re-rank of a (query_id, cand_id)
    shortlist; full vectors join only for the sliver.

    ``query_embeddings`` (optional, (query_id, embedding)) supplies the
    QUERY side directly — for callers whose queries are standalone
    frames rather than ``embeddings`` members (AnnIndexStore.topk: a
    query_id absent from the corpus frame must still produce rows).
    Default keeps the in-corpus behavior (both sides from
    ``embeddings``)."""
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    ).withColumn("n2", _dot(F.col("q"), F.col("q")))
    if query_embeddings is not None:
        qv = query_embeddings.select(
            "query_id", _quantized(F.col("embedding")).alias("qv")
        ).withColumn("qn2", _dot(F.col("qv"), F.col("qv")))
    else:
        qv = base.select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qv"),
            F.col("n2").alias("qn2"),
        )
    cv = base.select(
        F.col("vec_id").alias("cand_id"),
        F.col("q").alias("cv"),
        F.col("n2").alias("cn2"),
    )
    dot = _dot(F.col("qv"), F.col("cv"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("qn2").cast("double"))
        * F.sqrt(F.col("cn2").cast("double"))
    )
    rescored = (
        shortlist.join(qv, "query_id")
        .join(cv, "cand_id")
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ks: int = 16,
    dims: int = 64,
    rerank: int | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF routing composed in front of the PQ-ADC scan — the full
    billion-scale ANN shape (FAISS-style IVFADC) in Catalyst terms:

    1. coarse quantizer assigns every candidate to its nearest list
       and every query to its ``n_probe`` nearest (``_centroid_ranked``,
       shared with :func:`ivf_topk`);
    2. the ADC scan joins codes ⋈ query tables **on the list id** — so
       only ~n_probe/n_centroids of the corpus is scored, and each
       scored row costs m table lookups over an 8-byte code;
    3. exact-cosine re-rank of the top-``rerank`` sliver.

    Candidates live in exactly one list, so a (query, candidate) pair
    is scored at most once — no dedup stage. Recall compounds the two
    approximations (list pruning x code quantization); pinned in tests
    against brute force, with the planted-duplicate guarantee intact
    (an exact copy shares the query's top list AND maximizes ADC).
    """
    if rerank is None:
        rerank = 4 * k
    cent_rows = (
        embeddings.select(
            "vec_id",
            "embedding",
            F.sha2(F.col("vec_id").cast("string"), 256).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(n_centroids)
    )
    ranked = _centroid_ranked(embeddings, cent_rows)
    cand_lists = ranked.filter(
        (F.col("vec_id") >= n_queries) & (F.col("crank") == 1)
    ).select(F.col("vec_id").alias("cand_id"), F.col("cent_vid").alias("lst"))
    query_lists = ranked.filter(
        (F.col("vec_id") < n_queries) & (F.col("crank") <= n_probe)
    ).select(F.col("vec_id").alias("query_id"), F.col("cent_vid").alias("lst"))

    cb = _pq_codebook(embeddings, m, ks, dims, refine_iters)
    codes = pq_encode(
        embeddings.filter(F.col("vec_id") >= n_queries), m, ks, dims, codebook=cb
    )
    tables = _pq_query_tables(embeddings, n_queries, cb, m, dims)
    qt = tables.join(query_lists, "query_id")  # n_queries * n_probe rows
    scored = (
        codes.withColumnRenamed("vec_id", "cand_id")
        .join(cand_lists, "cand_id")
        .join(F.broadcast(qt), "lst")
        .select(
            "query_id",
            "cand_id",
            _pq_adc(F.col("t"), F.col("codes")).alias("adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("cand_id").asc()
    )
    shortlist = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= rerank)
        .select("query_id", "cand_id")
    )
    return _exact_rerank_pairs(shortlist, embeddings, k)
