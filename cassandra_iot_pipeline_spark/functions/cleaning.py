"""Corpus-cleaning operators for training-data pipelines: PII
redaction, benchmark-contamination detection, and sequence packing.

All hot paths are Catalyst expressions (regexp_replace/regexp_count,
explode, hash joins, window cumsums) — JVM-side, codegen'd. The one
deliberate exception is greedy bin packing (`pack_greedy`), whose
accumulate-and-reset recurrence is not expressible as a window
function; it runs as applyInPandas *per shard*, so state never exceeds
one shard and shards parallelize freely.

Every regex is kept inside the Java-regex ∩ RE2 common subset so the
Spark plan and the DuckDB oracle execute the *same* pattern.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import _oracle_tokens, tokens

# --- PII redaction -----------------------------------------------------------

# Ordered: earlier patterns must not be re-matchable by later ones.
# Email first (its local part can contain digits), then IPv4 (dots —
# excluded from the phone charset), then SSN/credit-card shapes (more
# specific digit layouts), then generic phone runs last.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"),
    ("card", "\\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\\b"),
    ("phone", "\\+?[0-9][0-9() -]{6,}[0-9]\\b"),
)


def redact_pii(documents: DataFrame) -> DataFrame:
    """Replace PII spans with ``[TYPE]`` tokens and count matches.

    One narrow projection — no shuffle, no Python. Counts are taken
    *before* each replacement on the progressively-redacted text, so a
    span consumed by an earlier (more specific) pattern is not double
    counted by a later one: the sequential-replace order IS the
    operator contract, mirrored verbatim in the oracle.

    Output: doc_id, text (redacted), n_email/n_ipv4/n_ssn/n_card/
    n_phone (int), n_pii (total).
    """
    text: Column = F.col("text")
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.regexp_count(text, F.lit(pat)).cast("int").alias(f"n_{name}")
        )
        text = F.regexp_replace(text, pat, f"[{name.upper()}]")
    out = documents.select(
        "doc_id", text.alias("text"), *counts
    )
    total = sum((F.col(f"n_{n}") for n, _ in PII_PATTERNS[1:]),
                F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.withColumn("n_pii", total.cast("int"))


def redact_pii_oracle(source_table: str = "documents") -> str:
    """DuckDB twin: identical patterns, identical replace order."""

    def sql_lit(pat: str) -> str:
        # standard SQL strings don't interpret backslashes — only
        # quotes need doubling
        return "'" + pat.replace("'", "''") + "'"

    text_expr = "text"
    count_exprs = []
    for name, pat in PII_PATTERNS:
        count_exprs.append(
            f"CAST(len(regexp_extract_all({text_expr}, {sql_lit(pat)}))"
            f" AS INTEGER) AS n_{name}"
        )
        text_expr = (
            f"regexp_replace({text_expr}, {sql_lit(pat)},"
            f" '[{name.upper()}]', 'g')"
        )
    total = " + ".join(f"n_{name}" for name, _ in PII_PATTERNS)
    inner = ", ".join(["doc_id", f"{text_expr} AS text"] + count_exprs)
    return (
        f"SELECT doc_id, text, {', '.join('n_' + n for n, _ in PII_PATTERNS)},"
        f" CAST({total} AS INTEGER) AS n_pii"
        f" FROM (SELECT {inner} FROM {source_table})"
    )


# --- benchmark-contamination detection ---------------------------------------


def _shingle_hash_rows(documents: DataFrame, n: int) -> DataFrame:
    """(doc_id, h): one row per n-token shingle occurrence, h =
    xxhash64 of the space-joined shingle.

    The index explodes through a Generate and slices a *materialized*
    token array, so tokenization runs once per document. (A
    ``transform`` lambda over ``sequence(...)`` re-evaluates the
    tokenizer expression per element — and CollapseProject re-inlines
    any pre-projection — making the scan O(tokens²) per doc: measured
    997 s vs ~7 s for the 100k-doc probe. Same lesson as
    dedup.shingle_rows.)

    Docs with fewer than ``n`` tokens emit no rows: the sequence bound
    is guarded because ``sequence(1, 0)`` is a *descending* sequence in
    Spark, not empty."""
    tok_df = documents.select("doc_id", tokens(F.col("text")).alias("toks"))
    bound = F.greatest(F.size("toks") - (n - 1), F.lit(0))
    idx = F.explode(
        F.when(bound >= 1, F.sequence(F.lit(1), bound)).otherwise(
            F.array().cast("array<int>")
        )
    )
    return tok_df.select("doc_id", "toks", idx.alias("i")).select(
        "doc_id",
        F.xxhash64(F.concat_ws(" ", F.slice("toks", F.col("i"), n))).alias(
            "h"
        ),
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    flag_threshold: float = 0.1,
) -> DataFrame:
    """Per-document n-gram overlap against a benchmark/eval corpus —
    the standard decontamination pass run before pretraining (n-gram
    collision against held-out benchmarks).

    Plan (100 TB posture): the benchmark side reduces to its DISTINCT
    shingle *hashes* (8 bytes each) and is broadcast — eval suites are
    tiny next to a pretraining corpus. The corpus explodes to shingle
    hashes, broadcast-joins (no shuffle of corpus payloads beyond the
    8-byte hash column), and aggregates per doc_id with two distinct
    counts (distinct shingles, distinct hit shingles) — occurrence
    rows never shuffle pre-deduplicated; partial aggregation dedups
    map-side and the one exchange carries (doc_id, gid, hash) triples.
    Documents with fewer than ``n`` tokens have no shingles and are
    reported with zero overlap via the left join back to the corpus
    spine.

    Output: doc_id, n_shingles, n_hit, contamination (hit fraction,
    NULL when the doc has no shingles), contaminated (bool).
    """
    bench_sh = (
        _shingle_hash_rows(benchmark, n).select(F.col("h").alias("bh")).distinct()
    )
    corpus_sh = _shingle_hash_rows(corpus, n)
    hits = (
        corpus_sh.join(
            F.broadcast(bench_sh), corpus_sh["h"] == bench_sh["bh"], "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("h")).alias("n_shingles"),
            F.count_distinct(
                F.when(F.col("bh").isNotNull(), F.col("h"))
            ).alias("n_hit"),
        )
    )
    rate = F.col("n_hit") / F.col("n_shingles")
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            rate.alias("contamination"),
            F.coalesce(rate >= flag_threshold, F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


def contamination_overlap_oracle(
    corpus_table: str = "documents",
    benchmark_sql: str = "SELECT * FROM documents WHERE doc_id % 17 = 0",
    n: int = 8,
    flag_threshold: float = 0.1,
) -> str:
    """DuckDB twin. Shingles are compared as strings (no xxhash64 in
    DuckDB) — equality of string shingles == equality of their hashes
    modulo collisions, and a 64-bit collision inside a test corpus is
    ignorable; the Spark side's hashing is a transport optimization,
    not a semantic change."""
    toks = _oracle_tokens("text")
    return f"""
        WITH corpus_sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(toks, i, i + {n - 1}), ' ') AS sh
            FROM (SELECT doc_id, {toks} AS toks FROM {corpus_table}),
                 UNNEST(range(1, greatest(len(toks) - {n - 1}, 0) + 1)) AS u(i)
        ),
        bench_sh AS (
            SELECT DISTINCT
                   array_to_string(list_slice(toks, i, i + {n - 1}), ' ') AS sh
            FROM (SELECT doc_id, {toks} AS toks
                  FROM ({benchmark_sql})),
                 UNNEST(range(1, greatest(len(toks) - {n - 1}, 0) + 1)) AS u(i)
        ),
        hits AS (
            SELECT c.doc_id,
                   COUNT(*) AS n_shingles,
                   COUNT(b.sh) AS n_hit
            FROM corpus_sh c LEFT JOIN bench_sh b USING (sh)
            GROUP BY c.doc_id
        )
        SELECT d.doc_id,
               COALESCE(n_shingles, 0) AS n_shingles,
               COALESCE(n_hit, 0) AS n_hit,
               CAST(n_hit AS DOUBLE) / n_shingles AS contamination,
               COALESCE(CAST(n_hit AS DOUBLE) / n_shingles
                        >= {flag_threshold}, FALSE) AS contaminated
        FROM {corpus_table} d LEFT JOIN hits USING (doc_id)
    """


# --- sequence packing --------------------------------------------------------


def pack_concat(
    documents: DataFrame, block_size: int = 2048, n_shards: int = 64
) -> DataFrame:
    """Concat-and-chunk packing (GPT-style pretraining): documents are
    laid end-to-end (+1 separator token each) in doc_id order and cut
    into fixed ``block_size`` token blocks; a document may straddle a
    block boundary.

    Layout is computed *per shard* (shard = xxhash64(doc_id) mod
    n_shards): the running-offset window partitions by shard, so no
    global sort and no single-reducer window — the classic
    unpartitioned-`Window.orderBy` scale trap. Blocks never cross
    shards; block ids are globally unique as (shard, block_in_shard).

    Output: doc_id, shard, n_tokens, start_tok (offset in shard
    stream), first_block, last_block, n_blocks (blocks spanned; 1 for
    an empty doc — it still owns its separator).
    """
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = documents.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).alias("shard"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    start = F.coalesce(F.sum(F.col("n_tokens") + 1).over(w), F.lit(0))
    laid = sized.withColumn("start_tok", start)
    first = F.floor(F.col("start_tok") / block_size)
    # end-inclusive last token of the doc (its separator): start + n_tokens
    last = F.floor((F.col("start_tok") + F.col("n_tokens")) / block_size)
    return laid.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_tok",
        first.alias("first_block"),
        last.alias("last_block"),
        (last - first + 1).cast("long").alias("n_blocks"),
    )


def pack_concat_oracle(
    block_size: int = 2048, n_shards: int = 64
) -> str:
    """DuckDB twin — but xxhash64 has no DuckDB implementation, so the
    oracle recomputes the shard from a Spark-exported column when used
    in tests; see tests/test_cleaning.py (the shard column is joined
    in, the window arithmetic is verified value-for-value)."""
    toks = _oracle_tokens("text")
    return f"""
        WITH sized AS (
            SELECT d.doc_id, s.shard,
                   CAST(len({toks}) AS BIGINT) AS n_tokens
            FROM documents d JOIN shards s USING (doc_id)
        ),
        laid AS (
            SELECT *,
                   COALESCE(SUM(n_tokens + 1) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS start_tok
            FROM sized
        )
        -- CAST start_tok: DuckDB's windowed SUM over BIGINT widens to
        -- HUGEINT, which fetchdf() materializes as float64 — the dtype-
        -- aware comparator (and the driver's hash) would diverge from
        -- Spark's int64 on representation alone
        SELECT doc_id, shard, n_tokens, CAST(start_tok AS BIGINT) AS start_tok,
               CAST(FLOOR(start_tok / {block_size}) AS BIGINT)
                   AS first_block,
               CAST(FLOOR((start_tok + n_tokens) / {block_size}) AS BIGINT)
                   AS last_block,
               CAST(FLOOR((start_tok + n_tokens) / {block_size})
                    - FLOOR(start_tok / {block_size}) + 1 AS BIGINT)
                   AS n_blocks
        FROM laid
    """


def pack_greedy(
    documents: DataFrame,
    block_size: int = 2048,
    n_shards: int = 64,
    truncate: bool = True,
) -> DataFrame:
    """Next-fit whole-document packing (SFT-style: documents must NOT
    straddle blocks): walk docs in doc_id order within a shard, append
    to the current bin while it fits, else open a new bin.

    The accumulate-and-reset recurrence (fill resets when a doc
    overflows) has no window-function form, so each shard packs inside
    one applyInPandas group — O(shard) memory, shards independent, the
    only shuffle is the groupBy(shard). Oversized docs (> block_size)
    are truncated to block_size tokens when ``truncate`` (flagged in
    the output), else placed alone in their own bin.

    Output: doc_id, shard, n_tokens (post-truncation), bin_id (within
    shard), bin_offset (token offset inside the bin), truncated.
    """
    sized = documents.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).alias("shard"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, fill = 0, 0
        out_bin, out_off, out_n, out_trunc = [], [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            trunc = truncate and n > block_size
            if trunc:
                n = block_size
            if fill + n > block_size and fill > 0:
                bin_id, fill = bin_id + 1, 0
            out_bin.append(bin_id)
            out_off.append(fill)
            out_n.append(n)
            out_trunc.append(trunc)
            fill += n
            if fill >= block_size:
                bin_id, fill = bin_id + 1, 0
        pdf["bin_id"] = pd.Series(out_bin, dtype="int64")
        pdf["bin_offset"] = pd.Series(out_off, dtype="int64")
        pdf["n_tokens"] = pd.Series(out_n, dtype="int64")
        pdf["truncated"] = pd.Series(out_trunc, dtype="bool")
        return pdf

    schema = (
        "doc_id long, shard long, n_tokens long, bin_id long,"
        " bin_offset long, truncated boolean"
    )
    return sized.groupBy("shard").applyInPandas(pack, schema=schema)


def pack_reference(
    rows: Iterable[tuple[int, int, int]], block_size: int, truncate: bool = True
) -> list[tuple[int, int, int, int, int, bool]]:
    """Driver-side reference implementation of the same next-fit walk,
    for tests: rows = (doc_id, shard, n_tokens) in any order; returns
    sorted (doc_id, shard, n_tokens, bin_id, bin_offset, truncated)."""
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for doc_id, shard, n in rows:
        by_shard.setdefault(shard, []).append((doc_id, n))
    out = []
    for shard, docs in by_shard.items():
        bin_id, fill = 0, 0
        for doc_id, n in sorted(docs):
            trunc = truncate and n > block_size
            if trunc:
                n = block_size
            if fill + n > block_size and fill > 0:
                bin_id, fill = bin_id + 1, 0
            out.append((doc_id, shard, n, bin_id, fill, trunc))
            fill += n
            if fill >= block_size:
                bin_id, fill = bin_id + 1, 0
    return sorted(out)


# --- corpus-wide line dedup (the C4/Gopher boilerplate rule) ----------------


def dedup_lines(
    documents: DataFrame,
    min_occurrences: int = 2,
    min_line_chars: int = 10,
    text_col: str = "text",
    hash_shuffle: bool = False,
) -> DataFrame:
    """(doc_id, text, n_removed): corpus-WIDE line deduplication — the
    C4/Gopher cleaning rule that drops boilerplate lines (nav bars,
    cookie banners, licence footers) repeated across documents, as
    distinct from substring dedup (span-level, functions/substrings.py)
    and document dedup (whole-doc, functions/dedup.py).

    Contract, exactly: a line (the text between ``\\n`` separators,
    byte-exact — no trimming) of at least ``min_line_chars`` characters
    that occurs at least ``min_occurrences`` times across the corpus
    keeps ONLY its first occurrence — smallest ``(doc_id, position)``,
    a total order, so the survivor is deterministic in both engines —
    and every other occurrence is removed. Shorter lines are exempt
    (never counted, never removed: empty lines and stub separators are
    structure, not boilerplate). Documents keep their remaining lines
    in order; a fully-boilerplate document comes back as the empty
    string, not a dropped row (removal accounting stays row-aligned).

    Plan shape: one posexplode over the split array, ONE
    map-side-combined count per line (a boilerplate line collapses to
    one row per task BEFORE the exchange — the substring-dedup
    de-skew lesson; no window is ever keyed on the line), a join back
    that AQE broadcast-converts when the duplicated-line set fits, and
    one per-doc rebuild aggregation. ``hash_shuffle=True`` swaps the
    line string for xxhash64 in the wide stages (8 bytes/line — the
    100 TB tier; the substring module's documented
    collision-probability contract applies)."""
    if min_occurrences < 2:
        raise ValueError(
            f"min_occurrences must be >= 2, got {min_occurrences}"
        )
    lines = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "pos", "line"
        ),
    )
    key = (
        F.xxhash64("line").alias("lk")
        if hash_shuffle
        else F.col("line").alias("lk")
    )
    eligible = lines.filter(F.length("line") >= min_line_chars)
    # keeper = min (doc_id, pos) per duplicated line; composed into one
    # exact DECIMAL(38,0) key (mirrored by HUGEINT in the oracle —
    # DuckDB's arg_min has no struct ordering) so MIN is overflow-free
    # at any doc_id
    composite = (
        F.col("doc_id").cast("decimal(38,0)") * F.lit(4294967296)
        + F.col("pos")
    )
    dups = (
        eligible.select(key, composite.alias("ck"))
        .groupBy("lk")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ck").alias("keeper"))
        .filter(F.col("n") >= min_occurrences)
        .select("lk", "keeper")
    )
    marked = lines.withColumn("_lk", key).join(
        dups.withColumnRenamed("lk", "_lk"), "_lk", "left"
    )
    drop = (
        F.col("keeper").isNotNull()
        & (F.length("line") >= min_line_chars)
        & (composite != F.col("keeper"))
    )
    rebuilt = (
        marked.withColumn("_drop", drop)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_drop"),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("text"),
            F.count(F.when(F.col("_drop"), F.lit(1))).alias("n_removed"),
        )
    )
    return rebuilt


def dedup_lines_oracle(
    min_occurrences: int = 2,
    min_line_chars: int = 10,
    source_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`dedup_lines` (exact-string tier)."""
    return f"""
        WITH parts AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls
            FROM {source_table}
        ),
        lines AS (
            SELECT doc_id,
                   generate_subscripts(ls, 1) - 1 AS pos,
                   unnest(ls) AS line
            FROM parts
        ),
        dups AS (
            SELECT line,
                   MIN(CAST(doc_id AS HUGEINT) * 4294967296 + pos) AS keeper
            FROM lines
            WHERE length(line) >= {min_line_chars}
            GROUP BY line
            HAVING COUNT(*) >= {min_occurrences}
        ),
        marked AS (
            SELECT l.doc_id, l.pos, l.line,
                   (d.keeper IS NOT NULL
                    AND length(l.line) >= {min_line_chars}
                    AND CAST(l.doc_id AS HUGEINT) * 4294967296 + l.pos
                        <> d.keeper) AS dropped
            FROM lines l LEFT JOIN dups d USING (line)
        )
        SELECT doc_id,
               COALESCE(
                   string_agg(CASE WHEN NOT dropped THEN line END,
                              chr(10) ORDER BY pos),
                   '') AS text,
               COUNT(CASE WHEN dropped THEN 1 END) AS n_removed
        FROM marked
        GROUP BY doc_id
    """


# --- per-key event capping ----------------------------------------------------


def cap_events_per_key(
    events: DataFrame,
    max_events: int,
    key_cols: Iterable[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    tie_col: str = "event_id",
    salt_partitions: int = 0,
) -> DataFrame:
    """Deterministic per-key event cap — keep the EARLIEST
    ``max_events`` rows of every ``key_cols`` group (earliest by
    ``(ts_col, tie_col)``, a total order, so the survivor set is
    identical under any partitioning — the dedup_lines
    first-occurrence-keeper discipline) and drop the rest.

    Why it exists: the engagement operators' per-key folds (funnel,
    paths, sessionization — see operators/funnel.py's hot-key bound)
    materialize each key's event list in one task; a bot key emitting
    ~10^8 typed events is one-task-OOM territory there. This is the
    curation rule that caps such keys UPSTREAM: group by (key,
    event-type) by default, so a bot's flood is bounded per type while
    every sane key (far under the cap) passes through untouched.

    Scale path: ``salt_partitions = S > 0`` splits each group's sort
    across S salt buckets first (salt = a pure hash of ``tie_col``, so
    determinism survives) — each bucket keeps its earliest
    ``max_events``, then one bounded window over the at most
    ``S * max_events`` survivors per group picks the true earliest set
    (the pigeonhole guarantee: the global earliest-N all live in some
    bucket's earliest-N). The bot key's 10^8-row sort becomes S tasks
    of 10^8/S rows each plus one task of S*N rows, instead of ONE task
    of 10^8. Bitwise-equal to the unsalted path (pinned in tests).

    Output: the input rows (original columns, unchanged values) of the
    survivors."""
    if max_events < 1:
        raise ValueError(f"max_events must be >= 1, got {max_events}")
    keys = list(key_cols)
    order = [F.col(ts_col).asc(), F.col(tie_col).asc()]
    cols = events.columns

    # helper columns must not collide with the caller's: withColumn
    # REPLACES a same-named input column, so a caller with their own
    # "_rn" would get row numbers back in place of their data
    def _free(base: str) -> str:
        name = base
        while name in cols:
            name += "_"
        return name

    c_salt, c_rn = _free("_salt"), _free("_rn")
    if salt_partitions > 0:
        salt = F.pmod(
            F.xxhash64(F.col(tie_col)), F.lit(salt_partitions)
        ).alias(c_salt)
        w1 = Window.partitionBy(*keys, c_salt).orderBy(*order)
        pre = (
            events.withColumn(c_salt, salt)
            .withColumn(c_rn, F.row_number().over(w1))
            .filter(F.col(c_rn) <= max_events)
            .drop(c_salt, c_rn)
        )
    else:
        pre = events
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        pre.withColumn(c_rn, F.row_number().over(w))
        .filter(F.col(c_rn) <= max_events)
        .select(*cols)
    )


def cap_events_per_key_oracle(
    max_events: int,
    key_cols: Iterable[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    tie_col: str = "event_id",
    columns: Iterable[str] = (
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ),
    source_table: str = "events",
) -> str:
    """DuckDB twin of :func:`cap_events_per_key`."""
    keys = ", ".join(key_cols)
    out = ", ".join(columns)
    return f"""
        SELECT {out} FROM (
            SELECT *, row_number() OVER (
                PARTITION BY {keys} ORDER BY {ts_col}, {tie_col}
            ) AS rn
            FROM {source_table}
        ) WHERE rn <= {max_events}
    """
