"""JSONL ingestion with quarantine (sources/jsonl.py): planted broken
lines land in quarantine with their raw text intact, good rows parse
under the declared contract, the missing-field-is-NULL-not-corrupt
gotcha is pinned, the three modes behave per contract, and the report
accounts corrupt + incomplete rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.sources.jsonl import (
    quarantine_report,
    read_jsonl,
    split_quarantine,
)

SCHEMA = "doc_id BIGINT, text STRING, lang STRING"

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
    '{"doc_id": 3, "text": "broken',                 # truncated JSON
    'not json at all',                               # garbage
    '{"doc_id": 4, "text": "no lang field"}',        # missing -> NULL
    '{"doc_id": "five", "text": "bad type", "lang": "en"}',  # type err
]


@pytest.fixture()
def src(tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_permissive_split_and_raw_lines(spark, src):
    df = read_jsonl(spark, src, SCHEMA)
    good, bad = split_quarantine(df)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2, 4]
    raws = sorted(r["raw_line"] for r in bad.collect())
    assert LINES[2] in raws and LINES[3] in raws and LINES[5] in raws
    assert len(raws) == 3
    assert "_corrupt" not in good.columns


def test_missing_field_is_null_not_corrupt(spark, src):
    df = read_jsonl(spark, src, SCHEMA)
    good, _ = split_quarantine(df)
    row4 = good.filter(F.col("doc_id") == 4).collect()[0]
    assert row4["lang"] is None  # parsed fine; field absent


def test_report_counts_corrupt_and_incomplete(spark, src, tmp_path):
    from cassandra_iot_pipeline_spark.sources.jsonl import land_jsonl

    good, bad, report = land_jsonl(
        spark, src, SCHEMA, str(tmp_path / "landed"), required=["lang"]
    )
    rep = report.collect()[0]
    assert rep["n_lines"] == 6
    assert rep["n_corrupt"] == 3
    assert rep["n_incomplete"] == 1  # doc 4's missing lang
    assert rep["bad_fraction"] == 4 / 6
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2, 4]
    assert bad.count() == 3
    # the cached-frame form agrees with the landed form
    df = read_jsonl(spark, src, SCHEMA).cache()
    rep2 = quarantine_report(df, required=["lang"]).collect()[0]
    assert tuple(rep2) == tuple(rep)


def test_dropmalformed_and_failfast(spark, src):
    dropped = read_jsonl(spark, src, SCHEMA, mode="dropmalformed")
    assert sorted(r["doc_id"] for r in dropped.collect()) == [1, 2, 4]
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_jsonl(spark, src, SCHEMA, mode="failfast").collect()
    with pytest.raises(ValueError, match="unknown mode"):
        read_jsonl(spark, src, SCHEMA, mode="lenient")


def test_split_requires_permissive(spark, src):
    df = read_jsonl(spark, src, SCHEMA, mode="dropmalformed")
    with pytest.raises(ValueError, match="no quarantine column"):
        split_quarantine(df)


def test_pruning_gotcha_pinned(spark, src, tmp_path):
    # corruption on a RAW scan is judged against the parsed
    # projection: an aggregate that never parses doc_id sees the
    # type-broken doc_id line as clean and under-reports — the reason
    # land_jsonl reports from the materialized copy
    from cassandra_iot_pipeline_spark.sources.jsonl import land_jsonl

    df = read_jsonl(spark, src, SCHEMA)
    # (required=['lang'] also anchors the scan: a raw-scan query whose
    # only referenced column is _corrupt is rejected outright by Spark)
    raw_scan = quarantine_report(df, required=["lang"]).collect()[0]
    assert raw_scan["n_corrupt"] == 2  # misses the doc_id type error
    _, _, report = land_jsonl(spark, src, SCHEMA, str(tmp_path / "l"))
    assert report.collect()[0]["n_corrupt"] == 3
