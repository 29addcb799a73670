"""Self-check harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry in ``__spark_entry__`` at a given scale
factor and compares against its ``oracle_sql()`` via DuckDB:
row count + column names + **logical dtype** + *exact* (bitwise for
floats) order-insensitive value comparison — stricter than the driver's
hash, so passing here implies passing there.

The dtype check is load-bearing: the driver hashes *representations*,
so a Spark DECIMAL vs DuckDB DOUBLE (``sql_revenue_by_segment``, r2) or
Spark int64 vs DuckDB HUGEINT→float64 (``type_pivot``, r2) fails the
driver even when every value is numerically equal.  An earlier version
of this tool coerced both sides to float64 before comparing and reported
"OK" for exactly those two queries; it also ran under the tuned
``build_session`` instead of a driver-like vanilla session.  Both blind
spots are closed: comparison now runs under ``tools.vanilla`` (the same
recipe as ``driver_rehearsal``) and any dtype-kind divergence is a FAIL.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import __spark_entry__ as entrymod  # noqa: E402
from cassandra_iot_pipeline_spark.catalog import TABLES, table_path  # noqa: E402
from vanilla import vanilla_session  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _logical_kind(arr: np.ndarray) -> str:
    """Collapse a numpy dtype into the representation class the driver's
    hash distinguishes: int / float / bool / datetime / str-or-object.
    A pandas ``object`` column of ``decimal.Decimal`` (Spark DECIMAL) is
    its own class — it never hashes equal to float64."""
    k = arr.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "O":
        import decimal

        for v in arr:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            if isinstance(v, decimal.Decimal):
                return "decimal"
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            return "object"
        return "object"
    return k


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns {s_cols} != oracle {o_cols}")
        return problems
    if problems:
        return problems
    s, o = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    for col in s.columns:
        a, b = s[col].to_numpy(), o[col].to_numpy()
        ka, kb = _logical_kind(a), _logical_kind(b)
        if ka != kb:
            problems.append(
                f"col {col}: DTYPE mismatch spark={ka}({a.dtype}) != "
                f"oracle={kb}({b.dtype}) — driver hash WILL diverge even "
                f"if values are numerically equal"
            )
            continue
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a64 = a.astype(np.float64)
            b64 = b.astype(np.float64)
            neq = ~(
                (a64 == b64) | (np.isnan(a64) & np.isnan(b64))
            )
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"col {col}: {neq.sum()} float mismatches, first at row {i}: "
                    f"{a64[i]!r} != {b64[i]!r} (diff {a64[i] - b64[i]:.3e})"
                )
        else:
            mask_a, mask_b = pd.isna(a), pd.isna(b)
            neq = ~((a == b) | (mask_a & mask_b))
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"col {col}: {neq.sum()} mismatches, first at row {i}: "
                    f"{a[i]!r} != {b[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = vanilla_session("oracle-check")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(spark_pdf)} rows, "
                  f"{time.time() - t0:.1f}s)")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures += 1
            continue
        problems = compare(spark_pdf, oracle_pdf)
        status = "OK  " if not problems else "FAIL"
        print(f"{status} {name}: {len(spark_pdf)} rows, {time.time() - t0:.1f}s")
        for p in problems:
            failures += 1
            print(f"     {p}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
