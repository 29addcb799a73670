"""Driver-gate rehearsal: every queries() entry must match its DuckDB
oracle exactly (bitwise on floats) at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tools.oracle_check import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle_or_is_declared_rows_only():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle entries without a query: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        pytest.skip(f"{name} is rows-only (non-SQL-expressible)")
    oracle_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "device_id",
        "hour_bucket",
        "avg_value",
        "max_value",
        "min_value",
        "event_count",
    ]
