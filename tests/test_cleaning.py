"""Corpus-cleaning operators (functions/cleaning.py): PII redaction,
contamination detection, sequence packing — DuckDB oracle parity plus
Python-reference parity for the non-SQL-expressible greedy packer."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.catalog import load_table, table_path
from cassandra_iot_pipeline_spark.functions.cleaning import (
    contamination_overlap,
    contamination_overlap_oracle,
    pack_concat,
    pack_concat_oracle,
    pack_greedy,
    pack_reference,
    redact_pii,
    redact_pii_oracle,
)
from tests.conftest import SF_DIR
from tools.oracle_check import compare

PII_DOCS = [
    (1, "contact me at jane.doe+spam@example.co.uk or on 020 7946 0958 ok"),
    (2, "server 10.0.0.1 and 192.168.255.255 rebooted; ssn 123-45-6789"),
    (3, "card 4111 1111 1111 1111 expired, call +1 (415) 555-2671 now"),
    (4, "no pii here, just text with numbers like 42 and 7"),
    (5, ""),
    (6, "a@b.io b@c.io two mails, one ip 8.8.8.8, phone 5551234567"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def pii_spark(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def pii_duck():
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(PII_DOCS, columns=["doc_id", "text"])
    )
    return con


def test_redact_pii_matches_oracle(pii_spark, pii_duck):
    got = redact_pii(pii_spark).toPandas()
    want = pii_duck.execute(redact_pii_oracle()).fetchdf()
    assert not compare(got, want)


def test_redact_pii_spans(pii_spark):
    rows = {r["doc_id"]: r for r in redact_pii(pii_spark).collect()}
    assert "[EMAIL]" in rows[1]["text"] and "[PHONE]" in rows[1]["text"]
    assert rows[2]["n_ipv4"] == 2 and rows[2]["n_ssn"] == 1
    assert rows[3]["n_card"] == 1 and rows[3]["n_phone"] == 1
    assert rows[4]["n_pii"] == 0 and rows[4]["text"] == PII_DOCS[3][1]
    assert rows[5]["n_pii"] == 0
    assert rows[6]["n_email"] == 2
    # redacted text never retains a raw match
    for r in rows.values():
        assert "@" not in r["text"].replace("[EMAIL]", "")


def test_redact_pii_fixture_corpus_matches_oracle(docs, duck):
    got = redact_pii(docs).toPandas()
    want = duck.execute(redact_pii_oracle()).fetchdf()
    assert not compare(got, want)


def test_contamination_matches_oracle(docs, duck):
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    got = contamination_overlap(docs, bench, n=8).toPandas()
    want = duck.execute(contamination_overlap_oracle(n=8)).fetchdf()
    assert not compare(got, want)
    # benchmark members are fully contaminated (overlap with themselves)
    self_rows = got[got.doc_id % 17 == 0]
    with_shingles = self_rows[self_rows.n_shingles > 0]
    assert (with_shingles.contamination == 1.0).all()
    assert with_shingles.contaminated.all()


def test_contamination_clean_benchmark_is_all_zero(spark, docs):
    bench = spark.createDataFrame(
        [(0, "zz yy xx ww vv uu tt ss rr qq pp oo")],
        "doc_id long, text string",
    )
    got = contamination_overlap(docs, bench, n=8).toPandas()
    assert (got.n_hit == 0).all()
    assert not got.contaminated.any()


def test_pack_concat_matches_oracle(docs, spark):
    got = pack_concat(docs, block_size=256, n_shards=8)
    pdf = got.toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{table_path(SF_DIR, 'documents')}'"
    )
    con.register("shards", pdf[["doc_id", "shard"]])
    want = con.execute(
        pack_concat_oracle(block_size=256, n_shards=8)
    ).fetchdf()
    assert not compare(pdf, want)


def test_pack_concat_layout_invariants(docs):
    pdf = pack_concat(docs, block_size=256, n_shards=8).toPandas()
    # offsets within a shard are dense: next start = prev start + n + 1
    for _, g in pdf.sort_values(["shard", "doc_id"]).groupby("shard"):
        starts = g.start_tok.to_numpy()
        ends = (g.start_tok + g.n_tokens + 1).to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == ends[:-1]).all()
        assert (g.first_block <= g.last_block).all()
        assert (g.n_blocks == g.last_block - g.first_block + 1).all()


def test_pack_greedy_matches_reference(docs):
    block = 256
    got = pack_greedy(docs, block_size=block, n_shards=8)
    rows = sorted(
        (r["doc_id"], r["shard"], r["n_tokens"], r["bin_id"],
         r["bin_offset"], r["truncated"])
        for r in got.collect()
    )
    sized = [(d, s, n) for d, s, n, *_ in rows]
    # reference walks the same (doc_id, shard, ORIGINAL n_tokens) input;
    # reconstruct pre-truncation sizes from the source of truth
    src = pack_greedy(docs, block_size=10**9, n_shards=8).collect()
    original = [(r["doc_id"], r["shard"], r["n_tokens"]) for r in src]
    want = pack_reference(original, block)
    assert rows == want
    # no bin overflows and offsets are consistent
    df = pd.DataFrame(
        rows,
        columns=["doc_id", "shard", "n_tokens", "bin_id", "bin_offset",
                 "truncated"],
    )
    assert ((df.bin_offset + df.n_tokens) <= block).all()
    fills = df.groupby(["shard", "bin_id"]).apply(
        lambda g: (g.n_tokens.sum() <= block), include_groups=False
    )
    assert fills.all()


def test_pack_greedy_truncates_oversized(spark):
    docs = spark.createDataFrame(
        [(1, "w " * 600), (2, "x y z")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           pack_greedy(docs, block_size=256, n_shards=1).collect()}
    assert out[1]["truncated"] and out[1]["n_tokens"] == 256
    assert not out[2]["truncated"]
    # the oversized doc fills its bin exactly; next doc starts a new bin
    assert out[1]["bin_id"] != out[2]["bin_id"] or out[1]["shard"] != out[2]["shard"]


def test_contamination_short_and_empty_docs(spark):
    """Docs with fewer than n tokens emit no shingles (sequence(1,0) is
    DESCENDING in Spark, not empty — the guard matters) and report
    zero overlap with NULL rate."""
    corpus = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "a b c d e f g h i j")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in
           contamination_overlap(corpus, bench, n=8).collect()}
    assert got[1]["n_shingles"] == 0 and got[1]["contamination"] is None
    assert got[2]["n_shingles"] == 0 and not got[2]["contaminated"]
    assert got[3]["n_shingles"] == 3 and got[3]["n_hit"] == 3
    assert got[3]["contaminated"]


def test_pack_reference_properties():
    """Property test for the next-fit reference packer (pure Python):
    random corpora, invariants that must hold for ANY correct packing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 10_000),          # doc_id
                st.integers(0, 3),               # shard
                st.integers(0, 600),             # n_tokens
            ),
            max_size=60,
            unique_by=lambda t: t[0],
        ),
        st.integers(8, 256),                     # block_size
    )
    def check(rows, block):
        out = pack_reference(rows, block)
        assert len(out) == len(rows)             # nothing lost
        by_bin = {}
        for doc_id, shard, n, bin_id, off, trunc in out:
            assert n <= block                    # truncation enforced
            assert off + n <= block              # no bin overflow
            by_bin.setdefault((shard, bin_id), []).append((off, n, doc_id))
        for members in by_bin.values():
            members.sort()
            pos = members[0][0]
            assert pos == 0                      # bins start at offset 0
            for off, n, _ in members:
                assert off == pos                # dense within the bin
                pos = off + n
        # next-fit never leaves a gap a doc from the SAME bin's tail
        # could have filled: total fill per bin <= block
        for members in by_bin.values():
            assert sum(n for _, n, _ in members) <= block

    check()


# --- corpus-wide line dedup ---------------------------------------------


LINE_DOCS = [
    # the boilerplate footer repeats across docs 1..3; doc 1 holds the
    # first occurrence (keeper). short lines ("--", "") are exempt.
    (1, "unique alpha content\ncopyright footer text\n--\nmore alpha"),
    (2, "copyright footer text\nunique beta content"),
    (3, "unique gamma content\n\ncopyright footer text"),
    (4, "entirely original document"),
    (5, "copyright footer text"),  # fully-boilerplate doc -> ""
]


def _line_frame(spark):
    return spark.createDataFrame(LINE_DOCS, "doc_id BIGINT, text STRING")


def test_dedup_lines_hand_computed(spark):
    from cassandra_iot_pipeline_spark.functions.cleaning import dedup_lines

    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in dedup_lines(_line_frame(spark), min_line_chars=10).collect()
    }
    assert got == {
        1: ("unique alpha content\ncopyright footer text\n--\nmore alpha", 0),
        2: ("unique beta content", 1),
        3: ("unique gamma content\n", 1),  # empty line survives (exempt)
        4: ("entirely original document", 0),
        5: ("", 1),
    }


def test_dedup_lines_matches_oracle(spark, duck):
    from cassandra_iot_pipeline_spark.functions.cleaning import (
        dedup_lines,
        dedup_lines_oracle,
    )
    from tools.oracle_check import compare

    duck.execute("DROP TABLE IF EXISTS line_docs")
    duck.execute("CREATE TABLE line_docs (doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO line_docs VALUES (?, ?)", LINE_DOCS)
    for thresh in (2, 3):
        got = dedup_lines(
            _line_frame(spark), min_occurrences=thresh, min_line_chars=10
        ).toPandas()
        want = duck.sql(
            dedup_lines_oracle(
                min_occurrences=thresh,
                min_line_chars=10,
                source_table="line_docs",
            )
        ).df()
        assert compare(got, want) == [], thresh


def test_dedup_lines_fixture_corpus_matches_oracle(docs, duck):
    """Fixture docs are single-line, so line dedup degenerates to
    whole-text dedup — still a real parity check over 5k docs with
    real duplicates (the fixture's planted near/exact dups)."""
    from cassandra_iot_pipeline_spark.functions.cleaning import (
        dedup_lines,
        dedup_lines_oracle,
    )
    from tools.oracle_check import compare

    got = dedup_lines(docs, min_line_chars=1).toPandas()
    want = duck.execute(dedup_lines_oracle(min_line_chars=1)).fetchdf()
    assert compare(got, want) == []
    assert len(got) == docs.count()  # row-aligned accounting


def test_dedup_lines_hash_tier_identical_here(spark):
    """hash_shuffle=True (the 8-byte 100 TB tier) is identical on a
    collision-free corpus — the substring module's contract."""
    from cassandra_iot_pipeline_spark.functions.cleaning import dedup_lines

    exact = sorted(
        tuple(r)
        for r in dedup_lines(_line_frame(spark), min_line_chars=10).collect()
    )
    hashed = sorted(
        tuple(r)
        for r in dedup_lines(
            _line_frame(spark), min_line_chars=10, hash_shuffle=True
        ).collect()
    )
    assert exact == hashed


# --- cap_events_per_key -------------------------------------------------------


def test_cap_events_per_key_matches_oracle(spark, duck):
    """Keep-earliest-N per (user, type) on the fixture events table —
    exact DuckDB parity (value-level, both row set and row content)."""
    from cassandra_iot_pipeline_spark.functions.cleaning import (
        cap_events_per_key,
        cap_events_per_key_oracle,
    )

    events = load_table(spark, SF_DIR, "events")
    got = cap_events_per_key(events, 5).orderBy("event_id").toPandas()
    want = (
        duck.sql(cap_events_per_key_oracle(5)).df().sort_values("event_id")
    )
    assert compare(got, want) == []
    assert len(got) < events.count()  # the cap actually bit


def test_cap_events_per_key_deterministic_and_salted_path_equal(spark):
    """The survivor set is a pure function of the data: identical
    under repartitioning, and the salted scale path is bitwise equal
    to the unsalted one (the pigeonhole guarantee)."""
    from cassandra_iot_pipeline_spark.functions.cleaning import (
        cap_events_per_key,
    )

    events = load_table(spark, SF_DIR, "events")

    def ids(df):
        return sorted(r["event_id"] for r in df.select("event_id").collect())

    plain = ids(cap_events_per_key(events, 3))
    shuffled = ids(cap_events_per_key(events.repartition(17, "value"), 3))
    salted = ids(cap_events_per_key(events, 3, salt_partitions=8))
    assert plain == shuffled == salted


def test_cap_events_per_key_caps_only_over_limit_keys(spark):
    """A bot key floods one type; sane keys and the bot's OTHER types
    pass untouched; survivors are the EARLIEST by (ts, tie)."""
    import datetime as dt

    from cassandra_iot_pipeline_spark.functions.cleaning import (
        cap_events_per_key,
    )

    rows = [
        # bot user 1: 10 clicks (to cap at 3 -> earliest ids 0,1,2)
        *[
            (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "click")
            for i in range(10)
        ],
        # bot user 1, different type: 2 views (under cap, untouched)
        (20, dt.datetime(2024, 1, 1, 1), 1, "view"),
        (21, dt.datetime(2024, 1, 1, 2), 1, "view"),
        # sane user 2
        (30, dt.datetime(2024, 1, 1, 3), 2, "click"),
    ]
    frame = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    )
    got = sorted(
        r["event_id"]
        for r in cap_events_per_key(frame, 3).select("event_id").collect()
    )
    assert got == [0, 1, 2, 20, 21, 30]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_events"):
        cap_events_per_key(frame, 0)


def test_cap_events_per_key_survives_helper_column_collision(spark):
    """A caller whose frame already carries _rn / _salt columns gets
    them back UNCHANGED — the helper names are generated
    collision-free (an overwritten _rn would silently replace the
    caller's data with row numbers)."""
    import datetime as dt

    from cassandra_iot_pipeline_spark.functions.cleaning import (
        cap_events_per_key,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "click", 100 + i, 200 + i)
        for i in range(6)
    ] + [(10, dt.datetime(2024, 1, 1, 1), 2, "view", 777, 888)]
    frame = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type STRING, _rn BIGINT, _salt BIGINT",
    )
    for salt in (0, 4):
        got = {
            r["event_id"]: (r["_rn"], r["_salt"])
            for r in cap_events_per_key(
                frame, 3, salt_partitions=salt
            ).collect()
        }
        assert got == {
            0: (100, 200),
            1: (101, 201),
            2: (102, 202),
            10: (777, 888),
        }
